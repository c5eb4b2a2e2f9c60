"""SigLIP-SO400M ViT vision tower as pure functions.

TPU-native replacement for the reference's HF `AutoModel` SigLIP wrapper
(`metamorph/model/multimodal_encoder/siglip_encoder.py:62-237`). Matches its
observable behavior:

  * hidden_states[select_layer] feature selection (`siglip_encoder.py:128-136`);
  * token reduction modes — `interpolation` (bilinear 27x27 -> k x k,
    align_corners=False, `siglip_encoder.py:151-163`), `mlpmixer`
    (`:164-168`), `concat_interpolation` (2x2 concat, `:169-201`);
  * optional L2-normalize (`:206-208`) and softmax/0.07 (`:210-211`);
  * `freeze_vision` == stop_gradient through the tower (`:139`).

The patch embedding is a strided conv (maps straight onto the MXU), attention
has q/k/v/o biases, MLP uses gelu(tanh), and the per-layer loop is `lax.scan`
over stacked params.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from metamorph_tpu.config import SiglipConfig, MultimodalConfig
from metamorph_tpu.ops.attention import dot_product_attention

Params = Dict[str, Any]


def init_siglip_params(rng: jax.Array, cfg: SiglipConfig, dtype=jnp.bfloat16) -> Params:
    D, F, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
    P = cfg.patch_size
    k = jax.random.split(rng, 10)

    def dense(key, shape, fan_in):
        return (jax.random.normal(key, shape, jnp.float32) * (fan_in ** -0.5)).astype(dtype)

    return {
        # conv kernel [P, P, 3, D] (HWIO)
        "patch_embed": {"kernel": dense(k[0], (P, P, 3, D), P * P * 3),
                        "bias": jnp.zeros((D,), dtype)},
        "pos_embed": dense(k[1], (cfg.num_patches, D), D),
        "layers": {
            "ln1": {"scale": jnp.ones((L, D), dtype), "bias": jnp.zeros((L, D), dtype)},
            "attn": {
                "wq": {"kernel": dense(k[2], (L, D, D), D), "bias": jnp.zeros((L, D), dtype)},
                "wk": {"kernel": dense(k[3], (L, D, D), D), "bias": jnp.zeros((L, D), dtype)},
                "wv": {"kernel": dense(k[4], (L, D, D), D), "bias": jnp.zeros((L, D), dtype)},
                "wo": {"kernel": dense(k[5], (L, D, D), D), "bias": jnp.zeros((L, D), dtype)},
            },
            "ln2": {"scale": jnp.ones((L, D), dtype), "bias": jnp.zeros((L, D), dtype)},
            "mlp": {
                "fc1": {"kernel": dense(k[6], (L, D, F), D), "bias": jnp.zeros((L, F), dtype)},
                "fc2": {"kernel": dense(k[7], (L, F, D), F), "bias": jnp.zeros((L, D), dtype)},
            },
        },
        "final_ln": {"scale": jnp.ones((D,), dtype), "bias": jnp.zeros((D,), dtype)},
    }


def layer_norm(x, scale, bias, eps):
    dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    x = (x - mean) * jax.lax.rsqrt(var + eps)
    return (x * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(dtype)


def _vit_block(cfg: SiglipConfig, x, p):
    B, T, D = x.shape
    H = cfg.num_heads
    Dh = D // H
    h = layer_norm(x, p["ln1"]["scale"], p["ln1"]["bias"], cfg.layer_norm_eps)
    a = p["attn"]
    q = (h @ a["wq"]["kernel"] + a["wq"]["bias"]).reshape(B, T, H, Dh)
    k = (h @ a["wk"]["kernel"] + a["wk"]["bias"]).reshape(B, T, H, Dh)
    v = (h @ a["wv"]["kernel"] + a["wv"]["bias"]).reshape(B, T, H, Dh)
    attn = dot_product_attention(q, k, v).reshape(B, T, D)
    x = x + (attn @ a["wo"]["kernel"] + a["wo"]["bias"])
    h = layer_norm(x, p["ln2"]["scale"], p["ln2"]["bias"], cfg.layer_norm_eps)
    m = p["mlp"]
    h = h @ m["fc1"]["kernel"] + m["fc1"]["bias"]
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(x.dtype)
    x = x + (h @ m["fc2"]["kernel"] + m["fc2"]["bias"])
    return x


def siglip_encode(params: Params, cfg: SiglipConfig, pixels: jnp.ndarray) -> jnp.ndarray:
    """pixels: [N, H, W, 3] (SigLIP-normalized) -> features [N, num_patches, D]
    at hidden_states[select_layer] (HF convention: index 0 = embeddings,
    index i = output of block i; -1 = last block output, pre-final-LN)."""
    dtype = params["pos_embed"].dtype
    x = jax.lax.conv_general_dilated(
        pixels.astype(dtype),
        params["patch_embed"]["kernel"],
        window_strides=(cfg.patch_size, cfg.patch_size),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(dtype)
    N = x.shape[0]
    x = x.reshape(N, -1, cfg.hidden_size) + params["patch_embed"]["bias"]
    x = x + params["pos_embed"][None]

    # select_layer: -1 -> run all L blocks; -2 -> run L-1 blocks; etc.
    sel = cfg.select_layer
    n_run = cfg.num_layers + 1 + sel if sel < 0 else sel
    if not (0 <= n_run <= cfg.num_layers):
        raise ValueError(f"select_layer {sel} out of range")

    def body(x, p):
        return _vit_block(cfg, x, p), None

    if n_run == cfg.num_layers:
        layers = params["layers"]
    else:
        layers = jax.tree.map(lambda a: a[:n_run], params["layers"])
    x, _ = jax.lax.scan(body, x, layers)
    # NOTE: hidden_states[sel] is pre-final-LN, so final_ln is NOT applied —
    # matching `feature_select` (`siglip_encoder.py:128-136`).
    return x


def reduce_tokens(
    features: jnp.ndarray,         # [N, num_patches, D]
    mm: MultimodalConfig,
    mixer_params: Optional[Params] = None,
) -> jnp.ndarray:
    """729 -> num_image_tokens reduction (`siglip_encoder.py:146-204`)."""
    N, T, D = features.shape
    if T == mm.num_image_tokens or mm.image_token_reduction == "none":
        return features
    side = int(round(T ** 0.5))
    if mm.image_token_reduction == "interpolation":
        tgt = int(round(mm.num_image_tokens ** 0.5))
        if tgt * tgt != mm.num_image_tokens:
            raise ValueError(
                f"num_image_tokens must be a perfect square for interpolation "
                f"reduction, got {mm.num_image_tokens}")
        grid = features.reshape(N, side, side, D).astype(jnp.float32)
        # antialias=False makes jax 'linear' == torch bilinear align_corners=False
        out = jax.image.resize(grid, (N, tgt, tgt, D), method="linear", antialias=False)
        return out.reshape(N, tgt * tgt, D).astype(features.dtype)
    if mm.image_token_reduction == "mlpmixer":
        tm, cm = mixer_params["token_mixer"], mixer_params["channel_mixer"]
        x = jnp.einsum("ntd,tk->nkd", features, tm["kernel"]) + tm["bias"][None, :, None]
        return x @ cm["kernel"] + cm["bias"]
    if mm.image_token_reduction == "concat_interpolation":
        tgt = int(round(mm.num_image_tokens ** 0.5))
        inter = tgt * 2
        grid = features.reshape(N, side, side, D).astype(jnp.float32)
        grid = jax.image.resize(grid, (N, inter, inter, D), method="linear", antialias=False)
        # 2x2 spatial concat -> [N, tgt, tgt, 4D]
        grid = grid.reshape(N, tgt, 2, tgt, 2, D).transpose(0, 1, 3, 2, 4, 5)
        grid = grid.reshape(N, tgt * tgt, 4 * D)
        return grid.astype(features.dtype)
    raise NotImplementedError(mm.image_token_reduction)


def vision_tower_forward(
    params: Params,
    cfg: SiglipConfig,
    mm: MultimodalConfig,
    pixels: jnp.ndarray,
    mixer_params: Optional[Params] = None,
) -> jnp.ndarray:
    """Full tower: ViT encode -> token reduction -> normalize/softmax.
    Returns [N, num_image_tokens, D] in SigLIP feature space (the AR target
    space, `metamorph_arch.py:140-164`)."""
    feats = siglip_encode(params, cfg, pixels)
    if mm.freeze_vision:
        feats = jax.lax.stop_gradient(feats)
    feats = reduce_tokens(feats, mm, mixer_params)
    if mm.normalize_vision:
        f32 = feats.astype(jnp.float32)
        feats = (f32 / jnp.maximum(jnp.linalg.norm(f32, axis=-1, keepdims=True), 1e-12)
                 ).astype(feats.dtype)
    if mm.apply_softmax:
        feats = jax.nn.softmax(feats.astype(jnp.float32) / 0.07, axis=-1).astype(feats.dtype)
    return feats
