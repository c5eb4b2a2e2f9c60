"""Pallas TPU decode attention: single-token queries against the KV cache.

The reference has no decode kernel at all — it recomputes the full sequence
every generated token (`metamorph/model/language_model/metamorph_llama.py:510`).
Our XLA decode path (dot-product attention over the padded cache) is already
O(T) per token; this kernel removes its remaining bandwidth waste, which is
what decode on TPU is bound by:

  * cache layout is [B, KV, S, Dh] — each (batch row, kv head) owns a
    contiguous [S, Dh] slab, so the kernel streams full tiles instead of the
    (1, Dh)-strided reads the [B, S, KV, Dh] layout would force;
  * GQA without materialization: ALL kv heads of a row ride in one block
    ([KV, BS, Dh]) with their q groups as sublanes — K/V are read ONCE, not
    H/KV times (the XLA path's `repeat_kv` broadcast), and the whole row is
    a single grid program per cache block (per-program overhead, not FLOPs,
    dominates single-token kernels);
  * blocks fully outside a row's valid [start, length) window skip their
    compute (the streaming-softmax update) via pl.when; their DMA still
    streams (clamping the index_map to re-use the previous buffer was
    measured SLOWER on v5e — it serializes the double-buffered pipeline).

`starts`/`lengths` give each row a contiguous valid window [start, length):
ragged continuous-batching rows (serve.py) use starts=0 with per-row lengths;
left-padded batched prompts (decode.py) use per-row starts. fp32 softmax.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LANES = 128


def _interpret() -> bool:
    import os

    v = os.environ.get("METAMORPH_PALLAS_INTERPRET")
    if v is not None:
        return v == "1"
    return jax.default_backend() != "tpu"


def _cdiv(a, b):
    return -(-a // b)


def _decode_kernel(starts_ref, lengths_ref,       # scalar prefetch [B]
                   q_ref,                         # [1, KV, G, Dh]
                   k_ref, v_ref,                  # [(1,) 1, KV, BS, Dh]
                   *rest,                         # (+[(1,) 1, KV, BS] scales
                                                  #   when quantized), o_ref,
                                                  #   acc, m_i, l_i scratch
                   scale, block_s, n_s, kv_heads, group, quantized=False):
    if quantized:
        ks_ref, vs_ref, o_ref, acc, m_i, l_i = rest
    else:
        o_ref, acc, m_i, l_i = rest
    b, j = pl.program_id(0), pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)
        m_i[...] = jnp.full_like(m_i, NEG_INF)
        l_i[...] = jnp.zeros_like(l_i)

    start = starts_ref[b]
    length = lengths_ref[b]
    k_start = j * block_s
    # blocks fully outside [start, length) carry no valid keys: skip compute
    # (their DMA was already skipped by the clamped index_map)
    active = jnp.logical_and(k_start < length, k_start + block_s > start)

    @pl.when(active)
    def _run():
        kb = k_ref[...].reshape(kv_heads, block_s, -1)
        vb = v_ref[...].reshape(kv_heads, block_s, -1)
        qb = q_ref[...].reshape(kv_heads, group, -1)
        if quantized:
            # int8 cache: dequant via the per-key-token scales, applied to the
            # [G, BS]-shaped score/probability planes (cheaper than scaling
            # the [BS, Dh] slabs) — HBM only ever moved int8
            ksb = ks_ref[...].reshape(kv_heads, block_s)
            vsb = vs_ref[...].reshape(kv_heads, block_s)
        col = k_start + jax.lax.broadcasted_iota(
            jnp.int32, (group, block_s), 1)
        mask = jnp.logical_and(col >= start, col < length)
        for h in range(kv_heads):       # static unroll: one MXU dot per head
            q = qb[h].astype(jnp.float32)              # [G, Dh]
            k = kb[h].astype(jnp.float32)              # [BS, Dh]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * scale
            if quantized:
                s = s * ksb[h][None, :]
            s = jnp.where(mask, s, NEG_INF)
            rows = slice(h * group, (h + 1) * group)
            m_prev = m_i[rows, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
            alpha = jnp.exp(m_prev - m_new)
            l_new = alpha * l_i[rows, :1] + jnp.sum(p, axis=1, keepdims=True)
            v = vb[h].astype(jnp.float32)              # [BS, Dh]
            if quantized:
                p = p * vsb[h][None, :]                # fold v's dequant in
            acc[rows, :] = acc[rows, :] * alpha + jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_i[rows, :] = jnp.broadcast_to(m_new, (group, m_i.shape[1]))
            l_i[rows, :] = jnp.broadcast_to(l_new, (group, l_i.shape[1]))

    @pl.when(j == n_s - 1)
    def _finish():
        l = l_i[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        out = (acc[...] / l_safe).astype(o_ref.dtype)
        o_ref[...] = out.reshape(o_ref.shape)


def decode_attention(
    q: jnp.ndarray,        # [B, H, Dh] — one new token per row
    k: jnp.ndarray,        # [B, KV, S, Dh] cache — or [L, B, KV, S, Dh] + layer
    v: jnp.ndarray,
    lengths: jnp.ndarray,  # [B] int32 — valid keys end (exclusive)
    starts: Optional[jnp.ndarray] = None,  # [B] int32 — valid keys begin
    block_s: int = 1024,
    scale: Optional[float] = None,
    layer: Optional[int] = None,
    k_scale: Optional[jnp.ndarray] = None,  # [(L,) B, KV, S] fp32: int8 cache
    v_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Streaming-softmax attention of one query token per row over its valid
    cache window. Returns [B, H, Dh] in q.dtype.

    Pass the FULL stacked cache [L, B, KV, S, Dh] plus a static `layer` when
    calling from an unrolled layer loop: the layer offset lives in the
    kernel's index_map, so XLA hands the kernel the whole (donated) cache
    buffer instead of materializing an [B, KV, S, Dh] slice copy per layer.

    With k_scale/v_scale the cache is int8 (per-token-per-head scales,
    `llama.init_kv_cache(quantized=True)`): the kernel streams int8 blocks —
    half the HBM traffic — and dequantizes on the score/probability planes."""
    B, H, Dh = q.shape
    stacked = k.ndim == 5
    assert stacked == (layer is not None), "layer goes with a stacked cache"
    quantized = k_scale is not None
    KV, S = k.shape[-3], k.shape[-2]
    G = H // KV
    scale = scale if scale is not None else Dh ** -0.5
    if starts is None:
        starts = jnp.zeros((B,), jnp.int32)
    block_s = min(block_s, S)
    n_s = _cdiv(S, block_s)
    qg = q.reshape(B, KV, G, Dh)

    def kv_index(b, j, starts, lengths):
        # NOTE: we deliberately do NOT clamp j into the valid block range to
        # re-use the previous buffer: measured on v5e, the repeated-index
        # "skip" serializes the DMA pipeline and costs more than streaming
        # the dead blocks (5.0 ms vs 3.3 ms per 600m decode step at 1/8 cache
        # fill). Out-of-window blocks are fetched but compute-skipped.
        if stacked:
            return (layer, b, 0, j, 0)
        return (b, 0, j, 0)

    def sc_index(b, j, starts, lengths):
        if stacked:
            return (layer, b, 0, j)
        return (b, 0, j)

    kv_block = ((1, 1, KV, block_s, Dh) if stacked else (1, KV, block_s, Dh))
    sc_block = ((1, 1, KV, block_s) if stacked else (1, KV, block_s))
    in_specs = [
        pl.BlockSpec((1, KV, G, Dh), lambda b, j, *_: (b, 0, 0, 0)),
        pl.BlockSpec(kv_block, kv_index),
        pl.BlockSpec(kv_block, kv_index),
    ]
    operands = [qg, k, v]
    if quantized:
        in_specs += [pl.BlockSpec(sc_block, sc_index),
                     pl.BlockSpec(sc_block, sc_index)]
        operands += [k_scale, v_scale]
    kernel = functools.partial(_decode_kernel, scale=scale, block_s=block_s,
                               n_s=n_s, kv_heads=KV, group=G,
                               quantized=quantized)
    o = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, n_s),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, KV, G, Dh),
                                   lambda b, j, *_: (b, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((KV * G, Dh), jnp.float32),
                pltpu.VMEM((KV * G, LANES), jnp.float32),
                pltpu.VMEM((KV * G, LANES), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, KV, G, Dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=_interpret(),
    )(starts.astype(jnp.int32), lengths.astype(jnp.int32), *operands)
    return o.reshape(B, H, Dh)


def _chunk_kernel(slot_ref, off_ref,              # scalar prefetch [1], [1]
                  q_ref,                          # [1, G*C, Dh]
                  k_ref, v_ref,                   # [1, 1, 1, BS, Dh]
                  *rest,                          # (+[1, 1, 1, BS] scales when
                                                  #   quantized), o_ref,
                                                  #   acc/m_i/l_i scratch
                  scale, block_s, n_s, chunk, group, quantized=False):
    if quantized:
        ks_ref, vs_ref, o_ref, acc, m_i, l_i = rest
    else:
        o_ref, acc, m_i, l_i = rest
    h, j = pl.program_id(0), pl.program_id(1)
    del h

    @pl.when(j == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)
        m_i[...] = jnp.full_like(m_i, NEG_INF)
        l_i[...] = jnp.zeros_like(l_i)

    off = off_ref[0]
    k_start = j * block_s
    rows = group * chunk

    # a block whose first key is past the chunk's last query position carries
    # nothing (queries c attend to keys <= off + c <= off + chunk - 1)
    @pl.when(k_start <= off + chunk - 1)
    def _run():
        q = q_ref[0].astype(jnp.float32)               # [G*C, Dh]
        k = k_ref[0, 0, 0].astype(jnp.float32)         # [BS, Dh]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if quantized:                                  # per-key dequant
            s = s * ks_ref[0, 0, 0][None, :]
        col = k_start + jax.lax.broadcasted_iota(jnp.int32, (rows, block_s), 1)
        c = jax.lax.broadcasted_iota(jnp.int32, (rows, block_s), 0) % chunk
        mask = col <= off + c
        s = jnp.where(mask, s, NEG_INF)
        m_prev = m_i[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        alpha = jnp.exp(m_prev - m_new)
        l_i[...] = jnp.broadcast_to(
            alpha * l_i[:, :1] + jnp.sum(p, axis=1, keepdims=True), l_i.shape)
        v = v_ref[0, 0, 0].astype(jnp.float32)
        if quantized:
            p = p * vs_ref[0, 0, 0][None, :]           # fold v's dequant in
        acc[...] = acc[...] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        m_i[...] = jnp.broadcast_to(m_new, m_i.shape)

    @pl.when(j == n_s - 1)
    def _finish():
        l = l_i[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc[...] / l_safe).astype(o_ref.dtype)


def chunk_attention(
    q: jnp.ndarray,          # [C, H, Dh] — one prompt chunk's queries
    k: jnp.ndarray,          # [L, B, KV, S, Dh] stacked cache
    v: jnp.ndarray,
    slot: jnp.ndarray,       # int32 — cache row being filled
    chunk_off: jnp.ndarray,  # int32 — absolute position of q[0]
    layer: int,
    block_s: int = 512,
    scale: Optional[float] = None,
    k_scale: Optional[jnp.ndarray] = None,   # [L, B, KV, S] fp32: int8 cache
    v_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Causal-with-offset attention of a prompt chunk against one row of the
    stacked decode cache (chunked-prefill serving path): query token c reads
    keys at positions <= chunk_off + c. Streams the row's [KV, S, Dh] slab
    once — no [C, S] score materialization, no slab slice copy; one grid
    program per (kv head, cache block). Returns [C, H, Dh] in q.dtype.
    With k_scale/v_scale the slab is int8 and dequantized in-kernel."""
    C, H, Dh = q.shape
    KV, S = k.shape[2], k.shape[3]
    G = H // KV
    quantized = k_scale is not None
    scale = scale if scale is not None else Dh ** -0.5
    block_s = min(block_s, S)
    n_s = _cdiv(S, block_s)
    # row r = g*C + c per kv head — the kernel recovers c as r % chunk
    qg = q.reshape(C, KV, G, Dh).transpose(1, 2, 0, 3).reshape(KV, G * C, Dh)

    def kv_index(h, j, slot_ref, off_ref):
        return (layer, slot_ref[0], h, j, 0)

    def sc_index(h, j, slot_ref, off_ref):
        return (layer, slot_ref[0], h, j)

    in_specs = [
        pl.BlockSpec((1, G * C, Dh), lambda h, j, *_: (h, 0, 0)),
        pl.BlockSpec((1, 1, 1, block_s, Dh), kv_index),
        pl.BlockSpec((1, 1, 1, block_s, Dh), kv_index),
    ]
    operands = [qg, k, v]
    if quantized:
        in_specs += [pl.BlockSpec((1, 1, 1, block_s), sc_index),
                     pl.BlockSpec((1, 1, 1, block_s), sc_index)]
        operands += [k_scale, v_scale]
    kernel = functools.partial(_chunk_kernel, scale=scale, block_s=block_s,
                               n_s=n_s, chunk=C, group=G, quantized=quantized)
    o = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(KV, n_s),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, G * C, Dh), lambda h, j, *_: (h, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((G * C, Dh), jnp.float32),
                pltpu.VMEM((G * C, LANES), jnp.float32),
                pltpu.VMEM((G * C, LANES), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((KV, G * C, Dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=_interpret(),
    )(jnp.asarray([slot], jnp.int32), jnp.asarray([chunk_off], jnp.int32),
      *operands)
    return o.reshape(KV, G, C, Dh).transpose(2, 0, 1, 3).reshape(C, H, Dh)


def _chunk_kernel_batched(off_ref,                # scalar prefetch [B]
                          q_ref,                  # [1, 1, G*C, Dh]
                          k_ref, v_ref,           # [1, 1, 1, BS, Dh]
                          *rest,
                          scale, block_s, n_s, chunk, group, quantized=False):
    if quantized:
        ks_ref, vs_ref, o_ref, acc, m_i, l_i = rest
    else:
        o_ref, acc, m_i, l_i = rest
    b, j = pl.program_id(0), pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)
        m_i[...] = jnp.full_like(m_i, NEG_INF)
        l_i[...] = jnp.zeros_like(l_i)

    off = off_ref[b]
    k_start = j * block_s
    rows = group * chunk

    @pl.when(k_start <= off + chunk - 1)
    def _run():
        q = q_ref[0, 0].astype(jnp.float32)            # [G*C, Dh]
        k = k_ref[0, 0, 0].astype(jnp.float32)         # [BS, Dh]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        if quantized:
            s = s * ks_ref[0, 0, 0][None, :]
        col = k_start + jax.lax.broadcasted_iota(jnp.int32, (rows, block_s), 1)
        c = jax.lax.broadcasted_iota(jnp.int32, (rows, block_s), 0) % chunk
        mask = col <= off + c
        s = jnp.where(mask, s, NEG_INF)
        m_prev = m_i[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
        alpha = jnp.exp(m_prev - m_new)
        l_i[...] = jnp.broadcast_to(
            alpha * l_i[:, :1] + jnp.sum(p, axis=1, keepdims=True), l_i.shape)
        v = v_ref[0, 0, 0].astype(jnp.float32)
        if quantized:
            p = p * vs_ref[0, 0, 0][None, :]
        acc[...] = acc[...] * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        m_i[...] = jnp.broadcast_to(m_new, m_i.shape)

    @pl.when(j == n_s - 1)
    def _finish():
        l = l_i[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc[...] / l_safe).astype(o_ref.dtype)


def chunk_attention_batched(
    q: jnp.ndarray,          # [B, C, H, Dh] — every row's chunk queries
    k: jnp.ndarray,          # [L, B, KV, S, Dh] stacked cache
    v: jnp.ndarray,
    offs: jnp.ndarray,       # [B] int32 — per-row position of q[b, 0]
    layer: int,
    block_s: int = 512,
    scale: Optional[float] = None,
    k_scale: Optional[jnp.ndarray] = None,   # [L, B, KV, S] fp32: int8 cache
    v_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Batched causal-with-offset chunk attention (speculative decoding path,
    `llama.decode_chunk_step_batched`): every batch row b verifies its own
    C-token chunk against ITS cache row at ITS ragged offset offs[b] — one
    grid program per (row, kv head, cache block), each streaming one [BS, Dh]
    cache block once. Cache row index == batch row index (the serving layout:
    unpadded rows, starts at 0). Returns [B, C, H, Dh] in q.dtype."""
    B, C, H, Dh = q.shape
    KV, S = k.shape[2], k.shape[3]
    G = H // KV
    quantized = k_scale is not None
    scale = scale if scale is not None else Dh ** -0.5
    block_s = min(block_s, S)
    n_s = _cdiv(S, block_s)
    qg = q.reshape(B, C, KV, G, Dh).transpose(0, 2, 3, 1, 4) \
          .reshape(B, KV, G * C, Dh)

    def kv_index(b, h, j, off_ref):
        return (layer, b, h, j, 0)

    def sc_index(b, h, j, off_ref):
        return (layer, b, h, j)

    in_specs = [
        pl.BlockSpec((1, 1, G * C, Dh), lambda b, h, j, *_: (b, h, 0, 0)),
        pl.BlockSpec((1, 1, 1, block_s, Dh), kv_index),
        pl.BlockSpec((1, 1, 1, block_s, Dh), kv_index),
    ]
    operands = [qg, k, v]
    if quantized:
        in_specs += [pl.BlockSpec((1, 1, 1, block_s), sc_index),
                     pl.BlockSpec((1, 1, 1, block_s), sc_index)]
        operands += [k_scale, v_scale]
    kernel = functools.partial(_chunk_kernel_batched, scale=scale,
                               block_s=block_s, n_s=n_s, chunk=C, group=G,
                               quantized=quantized)
    o = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, KV, n_s),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 1, G * C, Dh),
                                   lambda b, h, j, *_: (b, h, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((G * C, Dh), jnp.float32),
                pltpu.VMEM((G * C, LANES), jnp.float32),
                pltpu.VMEM((G * C, LANES), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, KV, G * C, Dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(offs.astype(jnp.int32), *operands)
    return o.reshape(B, KV, G, C, Dh).transpose(0, 3, 1, 2, 4) \
            .reshape(B, C, H, Dh)


def decode_attention_xla(
    q: jnp.ndarray,        # [B, H, Dh]
    k: jnp.ndarray,        # [B, KV, S, Dh] — bf16, or int8 with k_scale
    v: jnp.ndarray,
    lengths: jnp.ndarray,  # [B]
    starts: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    k_scale: Optional[jnp.ndarray] = None,   # [B, KV, S] fp32 (int8 cache)
    v_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """XLA reference with identical semantics (used on CPU / for parity tests);
    grouped einsum — the repeated K/V heads are never materialized. With an
    int8 cache the dequant (convert * per-token scale) fuses into the dot's
    operand read, so HBM still only moves int8."""
    B, H, Dh = q.shape
    KV, S = k.shape[1], k.shape[2]
    G = H // KV
    scale = scale if scale is not None else Dh ** -0.5
    if k_scale is not None:
        k = k.astype(jnp.float32) * k_scale[..., None]
        v = v.astype(jnp.float32) * v_scale[..., None]
    qg = q.reshape(B, KV, G, Dh).astype(jnp.float32)
    s = jnp.einsum("bkgd,bksd->bkgs", qg, k.astype(jnp.float32),
                   preferred_element_type=jnp.float32) * scale
    pos = jnp.arange(S)[None, :]
    mask = pos < lengths[:, None]
    if starts is not None:
        mask = jnp.logical_and(mask, pos >= starts[:, None])
    s = jnp.where(mask[:, None, None, :], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bkgs,bksd->bkgd", p, v.astype(jnp.float32))
    return o.reshape(B, H, Dh).astype(q.dtype)
