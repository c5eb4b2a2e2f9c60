"""Attention ops: reference XLA path + dispatch to the Pallas flash kernel.

Replaces the reference's flash_attn CUDA monkey patch
(`metamorph/train/llama_flash_attn_monkey_patch.py:32-109`). The XLA path keeps
fp32 softmax and lets XLA fuse; the Pallas path (ops/flash_attention.py) tiles
QK^T on the MXU with streaming softmax and never materializes the [T,T] scores.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def make_causal_mask(attn_mask: jnp.ndarray) -> jnp.ndarray:
    """[B,T] validity mask -> [B,1,T,T] boolean attend-allowed mask (causal+padding)."""
    B, T = attn_mask.shape
    causal = jnp.tril(jnp.ones((T, T), dtype=bool))
    pad = attn_mask.astype(bool)[:, None, None, :]  # keys
    return causal[None, None, :, :] & pad


def repeat_kv(x: jnp.ndarray, n_rep: int) -> jnp.ndarray:
    """[B,T,KV,Dh] -> [B,T,KV*n_rep,Dh] (GQA head replication)."""
    if n_rep == 1:
        return x
    B, T, KV, Dh = x.shape
    return jnp.broadcast_to(x[:, :, :, None, :], (B, T, KV, n_rep, Dh)).reshape(
        B, T, KV * n_rep, Dh
    )


def dot_product_attention(
    q: jnp.ndarray,        # [B, T, H, Dh]
    k: jnp.ndarray,        # [B, S, KV, Dh]
    v: jnp.ndarray,        # [B, S, KV, Dh]
    mask: Optional[jnp.ndarray] = None,  # [B, 1, T, S] bool, True = attend
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """GQA attention with fp32 softmax. Returns [B, T, H, Dh] in q.dtype."""
    H, KV = q.shape[2], k.shape[2]
    k = repeat_kv(k, H // KV)
    v = repeat_kv(v, H // KV)
    scale = scale if scale is not None else q.shape[-1] ** -0.5
    scores = jnp.einsum("bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32)
    scores = scores * scale
    if mask is not None:
        scores = jnp.where(mask, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bshd->bthd", probs, v)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    attn_mask: Optional[jnp.ndarray] = None,
    causal: bool = True,
    impl: str = "xla",
) -> jnp.ndarray:
    """Entry point used by the models.

    impl="xla": materialized-scores path (good for short seqs / CPU tests).
    impl="flash": Pallas TPU flash-attention kernel (training shapes).
    impl="ring": sequence-parallel ring attention — the sequence dim is
      sharded over the registered sequence mesh axis and K/V chunks rotate
      over ICI (`parallel/ring_attention.py`); causal only, which is exact for
      right-padded batches (pad sits after every valid query). Falls back to
      the flash kernel when no mesh / a trivial sequence axis is registered.
    """
    if impl == "flash":
        from metamorph_tpu.ops.flash_attention import flash_attention_sharded

        return flash_attention_sharded(q, k, v, attn_mask=attn_mask, causal=causal)
    if impl == "ring":
        from metamorph_tpu.ops.flash_attention import flash_attention
        from metamorph_tpu.parallel.context import (get_current_mesh,
                                                    get_sequence_axis)
        from metamorph_tpu.parallel.ring_attention import ring_attention

        mesh = get_current_mesh()
        axis = get_sequence_axis() or "fsdp"
        sizes = {} if mesh is None else dict(zip(mesh.axis_names,
                                                 mesh.devices.shape))
        if mesh is None or sizes.get(axis, 1) == 1:
            return flash_attention(q, k, v, attn_mask=attn_mask, causal=causal)
        batch_axis = "data" if sizes.get("data", 1) > 1 else None
        return ring_attention(q, k, v, mesh, axis_name=axis,
                              batch_axis=batch_axis)
    if mask is None and attn_mask is not None and causal:
        mask = make_causal_mask(attn_mask)
    return dot_product_attention(q, k, v, mask=mask)
