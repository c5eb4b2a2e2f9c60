"""Device-side fused image preprocessing: resize + normalize on TPU.

Replaces the reference's per-image CPU PIL/torchvision preprocessing hot path
(`metamorph/train/train.py:1191-1207`, `siglip_encoder.py` ProcessorWrapper):
the host ships raw uint8 frames; bilinear resize to the SigLIP input size and
(x/255 - 0.5)/0.5 normalization run on-chip, fused by XLA into the gather/
matmul pipeline that feeds the patch-embedding conv (BASELINE north-star:
preprocess+encode as one device program).

The resize is expressed as two one-sided matmuls with precomputed interpolation
matrices — MXU-friendly, exactly bilinear (align_corners=False), no gathers.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from metamorph_tpu.multimodal.mm_utils import SIGLIP_MEAN, SIGLIP_STD


@functools.lru_cache(maxsize=32)
def _interp_matrix(src: int, dst: int) -> np.ndarray:
    """[dst, src] bilinear interpolation matrix, half-pixel centers."""
    out = np.zeros((dst, src), np.float32)
    pos = (np.arange(dst) + 0.5) * src / dst - 0.5
    lo = np.floor(pos).astype(int)
    frac = pos - lo
    lo_c = np.clip(lo, 0, src - 1)
    hi_c = np.clip(lo + 1, 0, src - 1)
    out[np.arange(dst), lo_c] += 1.0 - frac
    out[np.arange(dst), hi_c] += frac
    return out


def fused_resize_normalize(
    frames: jnp.ndarray,          # [N, H, W, 3] uint8 (or float 0..255)
    out_size: int = 384,
    mean: Tuple[float, float, float] = tuple(SIGLIP_MEAN),
    std: Tuple[float, float, float] = tuple(SIGLIP_STD),
) -> jnp.ndarray:
    """[N, S, S, 3] float32, SigLIP-normalized. Jittable; one XLA program."""
    N, H, W, C = frames.shape
    ry = jnp.asarray(_interp_matrix(H, out_size))          # [S, H]
    rx = jnp.asarray(_interp_matrix(W, out_size))          # [S, W]
    x = frames.astype(jnp.float32)
    # resize rows then cols as matmuls (MXU)
    x = jnp.einsum("sh,nhwc->nswc", ry, x)
    x = jnp.einsum("tw,nswc->nstc", rx, x)
    x = x / 255.0
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (x - mean) / std


def preprocess_and_encode(params, siglip_cfg, mm_cfg, frames_uint8: jnp.ndarray):
    """uint8 frames -> SigLIP features, entirely on device (preprocess fused
    into the encode program)."""
    from metamorph_tpu.models.siglip import vision_tower_forward

    px = fused_resize_normalize(frames_uint8, siglip_cfg.image_size)
    return vision_tower_forward(params, siglip_cfg, mm_cfg, px)
