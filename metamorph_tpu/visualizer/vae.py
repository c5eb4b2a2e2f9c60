"""SD-1.5 AutoencoderKL (VAE) in JAX.

Replaces diffusers' `AutoencoderKL` used by the reference visualizer
(`visualization/train.py:317-322`, latent scaling at `:522`): encoder
(down blocks + mid) -> 2x latent channels (mean, logvar); decoder symmetric.
NHWC layout, configurable so tests run a tiny instance. scaling_factor 0.18215.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from metamorph_tpu.visualizer.unet import (_conv_init, _gn_init, conv2d,
                                           group_norm)

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_groups: int = 32
    scaling_factor: float = 0.18215

    @staticmethod
    def tiny() -> "VAEConfig":
        return VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                         norm_groups=8)


def _init_res(key, cin, cout, dtype):
    k = jax.random.split(key, 3)
    p = {"norm1": _gn_init(cin, dtype), "conv1": _conv_init(k[0], 3, 3, cin, cout, dtype),
         "norm2": _gn_init(cout, dtype), "conv2": _conv_init(k[1], 3, 3, cout, cout, dtype)}
    if cin != cout:
        p["shortcut"] = _conv_init(k[2], 1, 1, cin, cout, dtype)
    return p


def _res(p, x, groups):
    h = group_norm(p["norm1"], x, groups)
    h = jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype)
    h = conv2d(p["conv1"], h)
    h = group_norm(p["norm2"], h, groups)
    h = jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype)
    h = conv2d(p["conv2"], h)
    if "shortcut" in p:
        x = conv2d(p["shortcut"], x, padding=0)
    return x + h


def _init_attn(key, c, dtype):
    k = jax.random.split(key, 4)
    mk = lambda kk: _conv_init(kk, 1, 1, c, c, dtype)
    return {"norm": _gn_init(c, dtype), "q": mk(k[0]), "k": mk(k[1]),
            "v": mk(k[2]), "out": mk(k[3])}


def _attn(p, x, groups):
    B, H, W, C = x.shape
    h = group_norm(p["norm"], x, groups)
    q = conv2d(p["q"], h, padding=0).reshape(B, H * W, C)
    k = conv2d(p["k"], h, padding=0).reshape(B, H * W, C)
    v = conv2d(p["v"], h, padding=0).reshape(B, H * W, C)
    s = jnp.einsum("btc,bsc->bts", q, k,
                   preferred_element_type=jnp.float32) * (C ** -0.5)
    a = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    o = jnp.einsum("bts,bsc->btc", a, v).reshape(B, H, W, C)
    return x + conv2d(p["out"], o, padding=0)


def init_vae_params(rng, cfg: VAEConfig, dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(rng, 256))
    ch = cfg.block_out_channels
    L = len(ch)

    enc = {"conv_in": _conv_init(next(keys), 3, 3, cfg.in_channels, ch[0], dtype),
           "down": [], "mid": {}, "norm_out": _gn_init(ch[-1], dtype),
           "conv_out": _conv_init(next(keys), 3, 3, ch[-1],
                                  2 * cfg.latent_channels, dtype)}
    cin = ch[0]
    for lvl in range(L):
        blk = {"resnets": [_init_res(next(keys), cin if i == 0 else ch[lvl],
                                     ch[lvl], dtype)
                           for i in range(cfg.layers_per_block)]}
        if lvl < L - 1:
            blk["downsample"] = _conv_init(next(keys), 3, 3, ch[lvl], ch[lvl], dtype)
        enc["down"].append(blk)
        cin = ch[lvl]
    enc["mid"] = {"res1": _init_res(next(keys), ch[-1], ch[-1], dtype),
                  "attn": _init_attn(next(keys), ch[-1], dtype),
                  "res2": _init_res(next(keys), ch[-1], ch[-1], dtype)}
    enc["quant_conv"] = _conv_init(next(keys), 1, 1, 2 * cfg.latent_channels,
                                   2 * cfg.latent_channels, dtype)

    dec = {"post_quant_conv": _conv_init(next(keys), 1, 1, cfg.latent_channels,
                                         cfg.latent_channels, dtype),
           "conv_in": _conv_init(next(keys), 3, 3, cfg.latent_channels, ch[-1], dtype),
           "mid": {"res1": _init_res(next(keys), ch[-1], ch[-1], dtype),
                   "attn": _init_attn(next(keys), ch[-1], dtype),
                   "res2": _init_res(next(keys), ch[-1], ch[-1], dtype)},
           "up": [], "norm_out": _gn_init(ch[0], dtype),
           "conv_out": _conv_init(next(keys), 3, 3, ch[0], cfg.in_channels, dtype)}
    rev = list(reversed(ch))
    cin = ch[-1]
    for lvl in range(L):
        blk = {"resnets": [_init_res(next(keys), cin if i == 0 else rev[lvl],
                                     rev[lvl], dtype)
                           for i in range(cfg.layers_per_block + 1)]}
        if lvl < L - 1:
            blk["upsample"] = _conv_init(next(keys), 3, 3, rev[lvl], rev[lvl], dtype)
        dec["up"].append(blk)
        cin = rev[lvl]

    return {"encoder": enc, "decoder": dec}


def vae_encode(params: Params, cfg: VAEConfig, images: jnp.ndarray,
               rng=None) -> jnp.ndarray:
    """images [B,H,W,3] in [-1,1] -> latents [B,H/2^(L-1),W/..,4] scaled by
    scaling_factor. Samples from the posterior when rng given, else mean."""
    g = cfg.norm_groups
    p = params["encoder"]
    x = conv2d(p["conv_in"], images)
    for blk in p["down"]:
        for res in blk["resnets"]:
            x = _res(res, x, g)
        if "downsample" in blk:
            # diffusers Downsample2D pads (0,1,0,1) asymmetrically, stride 2
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = jax.lax.conv_general_dilated(
                x, blk["downsample"]["kernel"], (2, 2), [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ).astype(x.dtype) + blk["downsample"]["bias"]
    x = _res(p["mid"]["res1"], x, g)
    x = _attn(p["mid"]["attn"], x, g)
    x = _res(p["mid"]["res2"], x, g)
    x = group_norm(p["norm_out"], x, g)
    x = jax.nn.silu(x.astype(jnp.float32)).astype(images.dtype)
    moments = conv2d(p["conv_out"], x)
    moments = conv2d(p["quant_conv"], moments, padding=0)
    mean, logvar = jnp.split(moments, 2, axis=-1)
    if rng is not None:
        logvar = jnp.clip(logvar, -30.0, 20.0)
        mean = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
            rng, mean.shape, mean.dtype)
    return mean * cfg.scaling_factor


def vae_decode(params: Params, cfg: VAEConfig, latents: jnp.ndarray) -> jnp.ndarray:
    """scaled latents -> images [B,H,W,3] in [-1,1]."""
    g = cfg.norm_groups
    p = params["decoder"]
    x = conv2d(p["post_quant_conv"], latents / cfg.scaling_factor, padding=0)
    x = conv2d(p["conv_in"], x)
    x = _res(p["mid"]["res1"], x, g)
    x = _attn(p["mid"]["attn"], x, g)
    x = _res(p["mid"]["res2"], x, g)
    for blk in p["up"]:
        for res in blk["resnets"]:
            x = _res(res, x, g)
        if "upsample" in blk:
            B, H, W, C = x.shape
            x = jax.image.resize(x, (B, 2 * H, 2 * W, C), method="nearest")
            x = conv2d(blk["upsample"], x)
    x = group_norm(p["norm_out"], x, g)
    x = jax.nn.silu(x.astype(jnp.float32)).astype(latents.dtype)
    return conv2d(p["conv_out"], x)
