"""SD-1.5 UNet2DCondition in JAX (pure functions over param pytrees).

TPU-native replacement for diffusers' `UNet2DConditionModel` used by the
reference visualizer (`visualization/train.py:313-353`). Implements the SD-1.5
topology: conv_in -> [CrossAttnDown x3, Down] -> mid (res-attn-res) ->
[Up, CrossAttnUp x3] -> GroupNorm -> conv_out, with sinusoidal time embedding,
GEGLU feed-forwards, and 768-d cross-attention conditioning. NHWC layout
(TPU conv-friendly); configurable width/depth so tests run a tiny instance.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    sample_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    cross_attention_dim: int = 768
    attention_head_dim: int = 8          # heads per attention (SD1.5: 8 heads)
    norm_groups: int = 32
    # which resolution levels carry cross-attention (SD1.5: all but the last)
    attn_levels: Tuple[bool, ...] = (True, True, True, False)

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4

    @staticmethod
    def tiny() -> "UNetConfig":
        return UNetConfig(block_out_channels=(32, 64), layers_per_block=1,
                          cross_attention_dim=16, attention_head_dim=4,
                          norm_groups=8, attn_levels=(True, False))


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def _conv_init(key, kh, kw, cin, cout, dtype):
    fan_in = kh * kw * cin
    k1, k2 = jax.random.split(key)
    bound = fan_in ** -0.5
    return {"kernel": jax.random.uniform(k1, (kh, kw, cin, cout), jnp.float32,
                                         -bound, bound).astype(dtype),
            "bias": jax.random.uniform(k2, (cout,), jnp.float32,
                                       -bound, bound).astype(dtype)}


def _dense_init(key, d_in, d_out, dtype):
    bound = d_in ** -0.5
    k1, k2 = jax.random.split(key)
    return {"kernel": jax.random.uniform(k1, (d_in, d_out), jnp.float32,
                                         -bound, bound).astype(dtype),
            "bias": jax.random.uniform(k2, (d_out,), jnp.float32,
                                       -bound, bound).astype(dtype)}


def _gn_init(c, dtype):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def _ln_init(c, dtype):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def conv2d(p, x, stride=1, padding=1):
    out = jax.lax.conv_general_dilated(
        x, p["kernel"], (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return out.astype(x.dtype) + p["bias"]


def dense(p, x):
    return x @ p["kernel"] + p["bias"]


def group_norm(p, x, groups, eps=1e-5):
    N, H, W, C = x.shape
    xf = x.astype(jnp.float32).reshape(N, H, W, groups, C // groups)
    mean = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = xf.var(axis=(1, 2, 4), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(N, H, W, C)
    return (xf * p["scale"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(x.dtype)


def layer_norm(p, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (out * p["scale"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(x.dtype)


def timestep_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """diffusers get_timestep_embedding(flip_sin_to_cos=True, shift=0)."""
    half = dim // 2
    exponent = -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32) / half
    emb = t.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None]
    return jnp.concatenate([jnp.cos(emb), jnp.sin(emb)], axis=-1)


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------

def _init_resnet(key, cin, cout, temb_dim, dtype):
    k = jax.random.split(key, 4)
    p = {
        "norm1": _gn_init(cin, dtype),
        "conv1": _conv_init(k[0], 3, 3, cin, cout, dtype),
        "time_emb": _dense_init(k[1], temb_dim, cout, dtype),
        "norm2": _gn_init(cout, dtype),
        "conv2": _conv_init(k[2], 3, 3, cout, cout, dtype),
    }
    if cin != cout:
        p["shortcut"] = _conv_init(k[3], 1, 1, cin, cout, dtype)
    return p


def _resnet(p, x, temb, groups):
    h = group_norm(p["norm1"], x, groups)
    h = jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype)
    h = conv2d(p["conv1"], h)
    t = dense(p["time_emb"], jax.nn.silu(temb.astype(jnp.float32)).astype(temb.dtype))
    h = h + t[:, None, None, :]
    h = group_norm(p["norm2"], h, groups)
    h = jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype)
    h = conv2d(p["conv2"], h)
    if "shortcut" in p:
        x = conv2d(p["shortcut"], x, padding=0)
    return x + h


def _init_attention(key, dim, ctx_dim, heads, dtype, self_attn: bool):
    k = jax.random.split(key, 4)
    kv_dim = dim if self_attn else ctx_dim
    return {
        "q": {"kernel": _dense_init(k[0], dim, dim, dtype)["kernel"]},
        "k": {"kernel": _dense_init(k[1], kv_dim, dim, dtype)["kernel"]},
        "v": {"kernel": _dense_init(k[2], kv_dim, dim, dtype)["kernel"]},
        "out": _dense_init(k[3], dim, dim, dtype),
    }


def _attention(p, x, ctx, heads):
    """x: [B, T, D]; ctx: [B, S, Dc] (== x for self-attention). No q/k/v bias
    (diffusers CrossAttention).

    Deliberately the materialized-scores XLA path, NOT the Pallas flash
    kernel: SD-1.5 head dims (40/80/160) are far below the 128-lane tile, so
    flash needs zero-padding to 128 which triples q/k/v traffic — measured
    6.68 -> 0.89 denoise steps/sec at 512px on v5e. XLA's fused
    softmax(QK^T)V wins for small-head-dim spatial attention."""
    B, T, D = x.shape
    Dh = D // heads
    q = (x @ p["q"]["kernel"]).reshape(B, T, heads, Dh)
    k = (ctx @ p["k"]["kernel"]).reshape(B, -1, heads, Dh)
    v = (ctx @ p["v"]["kernel"]).reshape(B, -1, heads, Dh)
    s = jnp.einsum("bthd,bshd->bhts", q, k,
                   preferred_element_type=jnp.float32) * (Dh ** -0.5)
    a = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhts,bshd->bthd", a, v).reshape(B, T, D)
    return dense(p["out"], out)


def _init_tblock(key, dim, ctx_dim, heads, dtype):
    k = jax.random.split(key, 6)
    return {
        "norm1": _ln_init(dim, dtype),
        "attn1": _init_attention(k[0], dim, ctx_dim, heads, dtype, self_attn=True),
        "norm2": _ln_init(dim, dtype),
        "attn2": _init_attention(k[1], dim, ctx_dim, heads, dtype, self_attn=False),
        "norm3": _ln_init(dim, dtype),
        "geglu": _dense_init(k[2], dim, 8 * dim, dtype),
        "ff_out": _dense_init(k[3], 4 * dim, dim, dtype),
    }


def _tblock(p, x, ctx, heads):
    x = x + _attention(p["attn1"], layer_norm(p["norm1"], x), layer_norm(p["norm1"], x), heads)
    x = x + _attention(p["attn2"], layer_norm(p["norm2"], x), ctx, heads)
    h = dense(p["geglu"], layer_norm(p["norm3"], x))
    a, b = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.gelu(b.astype(jnp.float32), approximate=False).astype(x.dtype)
    return x + dense(p["ff_out"], h)


def _init_transformer2d(key, dim, ctx_dim, heads, groups, dtype):
    k = jax.random.split(key, 3)
    return {
        "norm": _gn_init(dim, dtype),
        "proj_in": _conv_init(k[0], 1, 1, dim, dim, dtype),
        "block": _init_tblock(k[1], dim, ctx_dim, heads, dtype),
        "proj_out": _conv_init(k[2], 1, 1, dim, dim, dtype),
    }


def _transformer2d(p, x, ctx, heads, groups):
    B, H, W, C = x.shape
    res = x
    h = group_norm(p["norm"], x, groups)
    h = conv2d(p["proj_in"], h, padding=0)
    h = h.reshape(B, H * W, C)
    h = _tblock(p["block"], h, ctx, heads)
    h = h.reshape(B, H, W, C)
    return conv2d(p["proj_out"], h, padding=0) + res


def _upsample(p, x):
    B, H, W, C = x.shape
    x = jax.image.resize(x, (B, 2 * H, 2 * W, C), method="nearest")
    return conv2d(p, x)


# ---------------------------------------------------------------------------
# UNet init / apply
# ---------------------------------------------------------------------------

def init_unet_params(rng, cfg: UNetConfig, dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(rng, 512))
    ch = cfg.block_out_channels
    L = len(ch)
    temb_dim = cfg.time_embed_dim

    params: Params = {
        "time_mlp": {
            "fc1": _dense_init(next(keys), ch[0], temb_dim, dtype),
            "fc2": _dense_init(next(keys), temb_dim, temb_dim, dtype),
        },
        "conv_in": _conv_init(next(keys), 3, 3, cfg.sample_channels, ch[0], dtype),
        "down": [],
        "mid": {},
        "up": [],
        "norm_out": _gn_init(ch[0], dtype),
        "conv_out": _conv_init(next(keys), 3, 3, ch[0], cfg.out_channels, dtype),
    }

    # down blocks
    cin = ch[0]
    for lvl in range(L):
        cout = ch[lvl]
        blk = {"resnets": [], "attns": [] if cfg.attn_levels[lvl] else None}
        for i in range(cfg.layers_per_block):
            blk["resnets"].append(_init_resnet(next(keys), cin if i == 0 else cout,
                                               cout, temb_dim, dtype))
            if cfg.attn_levels[lvl]:
                blk["attns"].append(_init_transformer2d(
                    next(keys), cout, cfg.cross_attention_dim,
                    cfg.attention_head_dim, cfg.norm_groups, dtype))
        if lvl < L - 1:
            blk["downsample"] = _conv_init(next(keys), 3, 3, cout, cout, dtype)
        params["down"].append(blk)
        cin = cout

    # mid
    params["mid"] = {
        "res1": _init_resnet(next(keys), ch[-1], ch[-1], temb_dim, dtype),
        "attn": _init_transformer2d(next(keys), ch[-1], cfg.cross_attention_dim,
                                    cfg.attention_head_dim, cfg.norm_groups, dtype),
        "res2": _init_resnet(next(keys), ch[-1], ch[-1], temb_dim, dtype),
    }

    # up blocks (reverse order)
    rev = list(reversed(ch))
    cin = ch[-1]
    for lvl in range(L):
        cout = rev[lvl]
        skip_ch = rev[lvl]
        prev_out = rev[min(lvl + 1, L - 1)]
        blk = {"resnets": [],
               "attns": [] if list(reversed(cfg.attn_levels))[lvl] else None}
        for i in range(cfg.layers_per_block + 1):
            # skip connections pop from the down stack: the last skip of an up
            # block has the next level's channel count
            res_skip = skip_ch if i < cfg.layers_per_block else prev_out
            blk["resnets"].append(_init_resnet(
                next(keys), cin + res_skip if i == 0 else cout + res_skip,
                cout, temb_dim, dtype))
            if blk["attns"] is not None:
                blk["attns"].append(_init_transformer2d(
                    next(keys), cout, cfg.cross_attention_dim,
                    cfg.attention_head_dim, cfg.norm_groups, dtype))
        if lvl < L - 1:
            blk["upsample"] = _conv_init(next(keys), 3, 3, cout, cout, dtype)
        params["up"].append(blk)
        cin = cout

    return params


def unet_apply(params: Params, cfg: UNetConfig, sample: jnp.ndarray,
               t: jnp.ndarray, encoder_hidden_states: jnp.ndarray) -> jnp.ndarray:
    """sample [B,H,W,4], t [B] ints, encoder_hidden_states [B,77,768] ->
    predicted noise [B,H,W,4]."""
    heads = cfg.attention_head_dim
    groups = cfg.norm_groups
    ctx = encoder_hidden_states

    temb = timestep_embedding(t, cfg.block_out_channels[0])
    temb = dense(params["time_mlp"]["fc1"], temb.astype(sample.dtype))
    temb = jax.nn.silu(temb.astype(jnp.float32)).astype(sample.dtype)
    temb = dense(params["time_mlp"]["fc2"], temb)

    x = conv2d(params["conv_in"], sample)
    skips: List[jnp.ndarray] = [x]

    for blk in params["down"]:
        for i, res in enumerate(blk["resnets"]):
            x = _resnet(res, x, temb, groups)
            if blk.get("attns") is not None:
                x = _transformer2d(blk["attns"][i], x, ctx, heads, groups)
            skips.append(x)
        if "downsample" in blk:
            x = conv2d(blk["downsample"], x, stride=2)
            skips.append(x)

    x = _resnet(params["mid"]["res1"], x, temb, groups)
    x = _transformer2d(params["mid"]["attn"], x, ctx, heads, groups)
    x = _resnet(params["mid"]["res2"], x, temb, groups)

    for blk in params["up"]:
        for i, res in enumerate(blk["resnets"]):
            skip = skips.pop()
            x = jnp.concatenate([x, skip], axis=-1)
            x = _resnet(res, x, temb, groups)
            if blk.get("attns") is not None:
                x = _transformer2d(blk["attns"][i], x, ctx, heads, groups)
        if "upsample" in blk:
            x = _upsample(blk["upsample"], x)

    x = group_norm(params["norm_out"], x, groups)
    x = jax.nn.silu(x.astype(jnp.float32)).astype(sample.dtype)
    return conv2d(params["conv_out"], x)
