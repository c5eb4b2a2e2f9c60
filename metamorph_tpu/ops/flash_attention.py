"""Pallas TPU flash attention (forward + backward), GQA-aware.

TPU-native replacement for the reference's flash_attn CUDA monkey patch
(`metamorph/train/llama_flash_attn_monkey_patch.py:32-109`): tiled QK^T on the
MXU with streaming softmax — the [T, S] score matrix never hits HBM — plus a
flash backward (recompute-from-logsumexp) as a custom VJP.

Semantics:
  * causal masking;
  * right-padding masking via per-row valid lengths (the packed training batch
    is right-padded, `multimodal/packing.py`); padded *query* rows produce
    zeros;
  * GQA: q heads grouped onto kv heads through the BlockSpec index_map — the
    repeated K/V are never materialized in HBM.

Layout: q [B, T, H, Dh], k/v [B, S, KV, Dh] (model layout); kernels run on
[B, H, T, Dh]. fp32 accumulation; inputs may be bf16.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import numpy as np
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LANES = 128


def _interpret() -> bool:
    """Interpreter mode on non-TPU backends (CPU tests).

    METAMORPH_PALLAS_INTERPRET overrides the backend probe: the dev
    environment force-registers a remote-TPU platform, so default_backend()
    can say "tpu" while the computation actually targets virtual CPU devices
    (the multichip dryrun sets the override when it falls back to CPU)."""
    import os

    v = os.environ.get("METAMORPH_PALLAS_INTERPRET")
    if v is not None:
        return v == "1"
    return jax.default_backend() != "tpu"


def _cdiv(a, b):
    return -(-a // b)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(lengths_ref,  # scalar prefetch [B]
                q_ref, k_ref, v_ref,   # [1,1,BQ,Dh], [1,1,BK,Dh] x2
                o_ref, lse_ref,        # [1,1,BQ,Dh], [1,1,BQ]
                acc, m_i, l_i,         # scratch: [BQ,Dh] f32, [BQ,LANES], [BQ,LANES]
                *, scale, block_q, block_k, n_k, causal):
    b, h, iq, jk = (pl.program_id(0), pl.program_id(1), pl.program_id(2),
                    pl.program_id(3))

    @pl.when(jk == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)
        m_i[...] = jnp.full_like(m_i, NEG_INF)
        l_i[...] = jnp.zeros_like(l_i)

    length = lengths_ref[b]
    q_start = iq * block_q
    k_start = jk * block_k

    # causal block skip: process only if the block intersects the lower triangle
    should_run = True
    if causal:
        should_run = q_start + block_q - 1 >= k_start

    @pl.when(should_run)
    def _run():
        # bf16 matmul inputs + fp32 accumulation: casting inputs to fp32
        # forces fp32 MXU passes (~4x slower on v5e); softmax stays fp32
        q = q_ref[0, 0]                                # [BQ, Dh]
        k = k_ref[0, 0]                                # [BK, Dh]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale

        col = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        mask = col < length
        if causal:
            row = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            mask = jnp.logical_and(mask, col <= row)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_i[:, :1]                            # [BQ, 1]
        m_cur = jnp.max(s, axis=1, keepdims=True)      # [BQ, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        # guard fully-masked rows: exp(NEG_INF - NEG_INF) would be 1
        p = jnp.exp(s - m_new)
        p = jnp.where(mask, p, 0.0)
        alpha = jnp.exp(m_prev - m_new)                # [BQ, 1]
        l_new = alpha * l_i[:, :1] + jnp.sum(p, axis=1, keepdims=True)

        v = v_ref[0, 0]                                # [BK, Dh]
        acc[...] = acc[...] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_i[...] = jnp.broadcast_to(m_new, m_i.shape)
        l_i[...] = jnp.broadcast_to(l_new, l_i.shape)

    @pl.when(jk == n_k - 1)
    def _finish():
        l = l_i[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc[...] / l_safe).astype(o_ref.dtype)
        # logsumexp [BQ, 1]; fully-masked rows get NEG_INF
        lse = m_i[:, :1] + jnp.log(l_safe)
        lse_ref[0, 0] = jnp.where(l == 0.0, NEG_INF, lse)


def _fwd_kernel_tri(lengths_ref, iq_ref, jk_ref,  # scalar prefetch
                    q_ref, k_ref, v_ref, o_ref, lse_ref,
                    acc, m_i, l_i, *, block_q, block_k):
    """Causal triangle-grid forward: the grid enumerates only the block pairs
    intersecting the lower triangle — dead blocks get neither compute nor DMA
    (~2x fewer programs than the rectangular causal grid).

    Perf notes (v5e, T=16k, H=10, Dh=128 — the kernel is bound by VMEM
    traffic of the [BQ,BK] score block through the elementwise passes, NOT
    by exp: a probe replacing exp with a linear op measured the same time):
      * q arrives PRE-SCALED by scale*log2(e), so scores live in the log2
        domain — the per-block `s*scale` multiply and the multiply hidden
        inside every exp (exp(x) lowers to exp2(x*log2e)) both vanish;
      * p stays fp32 until the pv matmul (emitting p directly in bf16 to
        cut traffic measured SLOWER: 33.4 vs 30.3 ms — the kernel is not
        simply pass-count-bound either);
      * lse converts back to natural log at finish so the backward/ring
        contracts are unchanged."""
    b, t = pl.program_id(0), pl.program_id(2)
    iq = iq_ref[t]
    jk = jk_ref[t]

    @pl.when(jk == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)
        m_i[...] = jnp.full_like(m_i, NEG_INF)
        l_i[...] = jnp.zeros_like(l_i)

    length = lengths_ref[b]
    q_start = iq * block_q
    k_start = jk * block_k

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    v = v_ref[0, 0]

    # Only blocks touching the diagonal need the causal mask, and only blocks
    # crossing `length` need the padding mask. The unmasked path skips the
    # iota/compare/where chain entirely — most triangle blocks are fully
    # valid at long T.
    full = jnp.logical_and(k_start + block_k <= q_start + 1,
                           k_start + block_k <= length)

    def _update(s, mask):
        m_prev = m_i[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp2(s - m_new)
        if mask is not None:
            p = jnp.where(mask, p, 0.0)
        alpha = jnp.exp2(m_prev - m_new)
        l_new = alpha * l_i[:, :1] + jnp.sum(p, axis=1, keepdims=True)
        acc[...] = acc[...] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_i[:, :1] = m_new
        l_i[:, :1] = l_new

    @pl.when(full)
    def _fast():
        _update(s, None)

    @pl.when(~full)
    def _masked():
        # [blk,1] x [1,blk] iotas broadcast in the compare — materializing
        # two [blk,blk] int32 grids costs 8MB of VMEM stack at blk=1024
        col = k_start + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
        row = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
        mask = jnp.logical_and(col < length, col <= row)
        _update(jnp.where(mask, s, NEG_INF), mask)

    # last block of this q row: the k block containing the diagonal
    @pl.when(jk == ((iq + 1) * block_q - 1) // block_k)
    def _finish():
        l = l_i[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc[...] / l_safe).astype(o_ref.dtype)
        # back to natural log: lse_e = ln2 * m2 + ln(l)
        lse = jnp.float32(np.log(2.0)) * m_i[:, :1] + jnp.log(l_safe)
        lse_ref[0, 0] = jnp.where(l == 0.0, NEG_INF, lse)


def _fwd_tri(q, k, v, lengths, scale, block_q, block_k):
    """Triangle-grid causal forward (T == S; blocks may be rectangular)."""
    B, H, T, Dh = q.shape
    KV = k.shape[1]
    group = H // KV
    n_q = _cdiv(T, block_q)
    # row-major over k blocks whose start precedes the row's causal end
    iq_arr = np.asarray(
        [i for i in range(n_q)
         for _ in range(_cdiv((i + 1) * block_q, block_k))], np.int32)
    jk_arr = np.asarray(
        [j for i in range(n_q)
         for j in range(_cdiv((i + 1) * block_q, block_k))], np.int32)
    n_tri = len(iq_arr)

    # scores in the log2 domain (see _fwd_kernel_tri); fp32 constant fold so
    # the bf16 rounding is per-element, not a systematic scale bias
    q = (q.astype(jnp.float32) * (scale * np.log2(np.e))).astype(q.dtype)
    kernel = functools.partial(_fwd_kernel_tri,
                               block_q=block_q, block_k=block_k)
    o, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B, H, n_tri),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, Dh),
                             lambda b, h, t, L, iq, jk: (b, h, iq[t], 0)),
                pl.BlockSpec((1, 1, block_k, Dh),
                             lambda b, h, t, L, iq, jk: (b, h // group, jk[t], 0)),
                pl.BlockSpec((1, 1, block_k, Dh),
                             lambda b, h, t, L, iq, jk: (b, h // group, jk[t], 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, block_q, Dh),
                             lambda b, h, t, L, iq, jk: (b, h, iq[t], 0)),
                pl.BlockSpec((1, 1, block_q, 1),
                             lambda b, h, t, L, iq, jk: (b, h, iq[t], 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_q, Dh), jnp.float32),
                pltpu.VMEM((block_q, LANES), jnp.float32),
                pltpu.VMEM((block_q, LANES), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, H, T, Dh), q.dtype),
            jax.ShapeDtypeStruct((B, H, T, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(lengths, jnp.asarray(iq_arr), jnp.asarray(jk_arr), q, k, v)
    return o, lse


def _fwd(q, k, v, lengths, scale, causal, block_q, block_k):
    B, H, T, Dh = q.shape
    KV, S = k.shape[1], k.shape[2]
    group = H // KV
    n_q, n_k = _cdiv(T, block_q), _cdiv(S, block_k)

    # Triangle q blocks are clamped to 512: the two-path (masked/full) kernel
    # carries several [BQ, BK] fp32 temporaries on the VMEM stack — square
    # 1024 blocks overflow the 16MB scoped limit. FLASH_TRI_BLOCK[_K]
    # override for tuning experiments.
    blk_tri = min(block_q, int(os.environ.get("FLASH_TRI_BLOCK", "512")))
    blk_tri_k = min(S, int(os.environ.get("FLASH_TRI_BLOCK_K", "1024")))
    if S % blk_tri_k != 0:
        blk_tri_k = blk_tri          # square fallback keeps triangle coverage
    if (causal and T == S and T % blk_tri == 0 and S % blk_tri_k == 0
            and T // blk_tri >= 2):
        return _fwd_tri(q, k, v, lengths, scale, blk_tri, blk_tri_k)

    grid = (B, H, n_q, n_k)
    kernel = functools.partial(
        _fwd_kernel, scale=scale, block_q=block_q, block_k=block_k,
        n_k=n_k, causal=causal)

    o, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_q, Dh),
                             lambda b, h, i, j, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, block_k, Dh),
                             lambda b, h, i, j, *_: (b, h // group, j, 0)),
                pl.BlockSpec((1, 1, block_k, Dh),
                             lambda b, h, i, j, *_: (b, h // group, j, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, block_q, Dh),
                             lambda b, h, i, j, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, block_q, 1),
                             lambda b, h, i, j, *_: (b, h, i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_q, Dh), jnp.float32),
                pltpu.VMEM((block_q, LANES), jnp.float32),
                pltpu.VMEM((block_q, LANES), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, H, T, Dh), q.dtype),
            jax.ShapeDtypeStruct((B, H, T, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(lengths, q, k, v)
    return o, lse


# ---------------------------------------------------------------------------
# backward kernels (flash2-style recompute from logsumexp)
# ---------------------------------------------------------------------------

def _bwd_dq_kernel_tri(lengths_ref, iq_ref, jk_ref,
                       q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                       dq_ref, dq_acc, *, block_q, block_k):
    """Causal triangle-grid dq: the grid enumerates only the (iq, jk) block
    pairs whose k block starts before the q row's causal end, row-major, so
    dead upper-triangle blocks get neither compute nor DMA (the rectangular
    grid's @pl.when skips compute but still copies). Blocks may be
    rectangular (block_k > block_q mirrors _fwd_kernel_tri: same FLOPs,
    half the programs, larger dots per MXU dispatch).

    Log2-domain inputs (see _bwd): q arrives pre-scaled by scale*log2(e), do
    by scale, lse by log2(e), and delta is (delta - dlse)*scale — so the
    [blk,blk] `s*scale` multiply, the multiply inside the exp lowering, and
    the `(dp - delta + dlse) * scale` multiply all vanish. dq is exact:
    ds = p * (scale*dp - scale*(delta - dlse)) is the true cotangent."""
    b, t = pl.program_id(0), pl.program_id(2)
    iq = iq_ref[t]
    jk = jk_ref[t]

    @pl.when(jk == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    length = lengths_ref[b]
    q_start, k_start = iq * block_q, jk * block_k
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    lse = lse_ref[0, 0]
    delta = delta_ref[0, 0]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    full = jnp.logical_and(k_start + block_k <= q_start + 1,
                           k_start + block_k <= length)

    def _accum(p):
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dq_acc[...] += jax.lax.dot_general(ds.astype(k.dtype), k,
                                           (((1,), (0,)), ((), ())),
                                           preferred_element_type=jnp.float32)

    @pl.when(full)
    def _fast():
        # fully-valid block: exp2(s - lse) is exact without mask construction
        _accum(jnp.exp2(s - lse))

    @pl.when(~full)
    def _masked():
        col = k_start + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
        row = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
        mask = jnp.logical_and(col < length, col <= row)
        _accum(jnp.where(mask, jnp.exp2(s - lse), 0.0))

    # last k block of this q row: the one containing the diagonal
    @pl.when(jk == ((iq + 1) * block_q - 1) // block_k)
    def _finish():
        dq_ref[0, 0] = dq_acc[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel_tri(lengths_ref, jc_ref, ic_ref,
                        q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                        dlse_ref, dk_ref, dv_ref, dk_acc, dv_acc,
                        *, scale, block_q, block_k, n_q):
    """Causal triangle-grid dk/dv: column-major enumeration of the (jk, iq)
    block pairs whose q block can see the k column — each k/v column
    accumulates over only those q rows. Blocks may be rectangular
    (block_q > block_k: same FLOPs, half the programs)."""
    b, t = pl.program_id(0), pl.program_id(2)
    jk = jc_ref[t]
    iq = ic_ref[t]

    # first q block that reaches this column: its last row >= k_start
    @pl.when(iq == (jk * block_k) // block_q)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    length = lengths_ref[b]
    q_start, k_start = iq * block_q, jk * block_k
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]
    lse = lse_ref[0, 0]
    delta = delta_ref[0, 0]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    # mask-free iff every q row in the block is at/below every k col
    full = jnp.logical_and(q_start >= k_start + block_k - 1,
                           k_start + block_k <= length)

    def _accum(p):
        dv_acc[...] += jax.lax.dot_general(p.astype(do.dtype), do,
                                           (((0,), (0,)), ((), ())),
                                           preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta + dlse_ref[0, 0]) * scale
        dk_acc[...] += jax.lax.dot_general(ds.astype(q.dtype), q,
                                           (((0,), (0,)), ((), ())),
                                           preferred_element_type=jnp.float32)

    @pl.when(full)
    def _fast():
        _accum(jnp.exp(s - lse))

    @pl.when(~full)
    def _masked():
        col = k_start + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
        row = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0)
        mask = jnp.logical_and(col < length, col <= row)
        _accum(jnp.where(mask, jnp.exp(s - lse), 0.0))

    @pl.when(iq == n_q - 1)
    def _finish():
        dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _bwd_tri(q, k, v, lengths, do, lse, delta, dlse, scale, block):
    """Triangle-grid causal backward (T == S). Each pass mirrors the fwd's
    rectangular blocking along its STREAMING axis: dq (row-major, one q row
    accumulates across k columns) widens the k block; dk/dv (column-major,
    one k column accumulates across q rows) heightens the q block — same
    FLOPs, half the grid programs, one [512, 1024]-class dot per MXU
    dispatch instead of two square ones (measured faster at T>=8k, same at
    2k). Falls back to square `block` when T doesn't tile the wide axis."""
    B, H, T, Dh = q.shape
    KV = k.shape[1]
    group = H // KV

    wide = min(int(os.environ.get("FLASH_TRI_BLOCK_BWD_WIDE", "1024")), T)
    if T % wide or wide < block or T // wide < 4:
        # short rows: the first q rows see < wide columns, so the widened
        # k block is mostly dead DMA — the square grid wins below 4 blocks
        wide = block
    # dq pass: q rows of `block`, k columns of `wide` (row-major)
    n_q1 = _cdiv(T, block)
    iq_arr = np.asarray(
        [i for i in range(n_q1)
         for _ in range(_cdiv((i + 1) * block, wide))], np.int32)
    jk_arr = np.asarray(
        [j for i in range(n_q1)
         for j in range(_cdiv((i + 1) * block, wide))], np.int32)
    # dk/dv pass: k columns of `block`, q rows of `wide` (column-major);
    # the first q block that reaches column j starts at (j*block)//wide
    n_k2, n_q2 = _cdiv(T, block), _cdiv(T, wide)
    jc_arr = np.asarray(
        [j for j in range(n_k2)
         for _ in range(n_q2 - (j * block) // wide)], np.int32)
    ic_arr = np.asarray(
        [i for j in range(n_k2)
         for i in range((j * block) // wide, n_q2)], np.int32)

    # Log2-domain pre-scaling for the dq kernel (see _bwd_dq_kernel_tri):
    #   q' = q * scale*log2(e)     -> s' = log2e * s_nat (scores in log2)
    #   do' = do * scale           -> dp' = scale * dp_nat
    #   lse' = lse * log2(e)       -> exp2(s' - lse') == exp(s_nat - lse_nat)
    #   delta' = (delta - dlse) * scale
    # so ds = p * (dp' - delta') == p*(dp_nat - delta + dlse)*scale exactly.
    # fp32 constant fold before the bf16 round-trip (same as _fwd_tri).
    log2e = np.log2(np.e)
    q2 = (q.astype(jnp.float32) * (scale * log2e)).astype(q.dtype)
    do2 = (do.astype(jnp.float32) * scale).astype(do.dtype)
    lse2 = lse * jnp.float32(log2e)
    delta2 = (delta - dlse) * jnp.float32(scale)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel_tri, block_q=block, block_k=wide),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B, H, len(iq_arr)),
            in_specs=[
                pl.BlockSpec((1, 1, block, Dh),
                             lambda b, h, t, L, iq, jk: (b, h, iq[t], 0)),
                pl.BlockSpec((1, 1, wide, Dh),
                             lambda b, h, t, L, iq, jk: (b, h // group, jk[t], 0)),
                pl.BlockSpec((1, 1, wide, Dh),
                             lambda b, h, t, L, iq, jk: (b, h // group, jk[t], 0)),
                pl.BlockSpec((1, 1, block, Dh),
                             lambda b, h, t, L, iq, jk: (b, h, iq[t], 0)),
                pl.BlockSpec((1, 1, block, 1),
                             lambda b, h, t, L, iq, jk: (b, h, iq[t], 0)),
                pl.BlockSpec((1, 1, block, 1),
                             lambda b, h, t, L, iq, jk: (b, h, iq[t], 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, block, Dh),
                                   lambda b, h, t, L, iq, jk: (b, h, iq[t], 0)),
            scratch_shapes=[pltpu.VMEM((block, Dh), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, T, Dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(lengths, jnp.asarray(iq_arr), jnp.asarray(jk_arr),
      q2, k, v, do2, lse2, delta2)

    dk_h, dv_h = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel_tri, scale=scale, block_q=wide,
                          block_k=block, n_q=n_q2),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B, H, len(jc_arr)),
            in_specs=[
                pl.BlockSpec((1, 1, wide, Dh),
                             lambda b, h, t, L, jc, ic: (b, h, ic[t], 0)),
                pl.BlockSpec((1, 1, block, Dh),
                             lambda b, h, t, L, jc, ic: (b, h // group, jc[t], 0)),
                pl.BlockSpec((1, 1, block, Dh),
                             lambda b, h, t, L, jc, ic: (b, h // group, jc[t], 0)),
                pl.BlockSpec((1, 1, wide, Dh),
                             lambda b, h, t, L, jc, ic: (b, h, ic[t], 0)),
                pl.BlockSpec((1, 1, wide, 1),
                             lambda b, h, t, L, jc, ic: (b, h, ic[t], 0)),
                pl.BlockSpec((1, 1, wide, 1),
                             lambda b, h, t, L, jc, ic: (b, h, ic[t], 0)),
                pl.BlockSpec((1, 1, wide, 1),
                             lambda b, h, t, L, jc, ic: (b, h, ic[t], 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, block, Dh),
                             lambda b, h, t, L, jc, ic: (b, h, jc[t], 0)),
                pl.BlockSpec((1, 1, block, Dh),
                             lambda b, h, t, L, jc, ic: (b, h, jc[t], 0)),
            ],
            scratch_shapes=[pltpu.VMEM((block, Dh), jnp.float32),
                            pltpu.VMEM((block, Dh), jnp.float32)],
        ),
        out_shape=[jax.ShapeDtypeStruct((B, H, T, Dh), q.dtype),
                   jax.ShapeDtypeStruct((B, H, T, Dh), q.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(lengths, jnp.asarray(jc_arr), jnp.asarray(ic_arr),
      q, k, v, do, lse, delta, dlse)

    dk = dk_h.reshape(B, KV, group, T, Dh).sum(axis=2).astype(k.dtype)
    dv = dv_h.reshape(B, KV, group, T, Dh).sum(axis=2).astype(v.dtype)
    return dq, dk, dv, None


def _bwd_dq_kernel(lengths_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                   dlse_ref, dq_ref, dq_acc, *, scale, block_q, block_k, n_k, causal):
    b, h, iq, jk = (pl.program_id(0), pl.program_id(1), pl.program_id(2),
                    pl.program_id(3))

    @pl.when(jk == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    length = lengths_ref[b]
    q_start, k_start = iq * block_q, jk * block_k
    should_run = True
    if causal:
        should_run = q_start + block_q - 1 >= k_start

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0]                       # [BQ, 1]
        delta = delta_ref[0, 0]                   # [BQ, 1]

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        col = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        mask = col < length
        if causal:
            row = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            mask = jnp.logical_and(mask, col <= row)
        p = jnp.exp(s - lse)
        p = jnp.where(mask, p, 0.0)

        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # dlse: cotangent of the logsumexp output (ring-attention combines);
        # d lse_i / d s_ij = p_ij, so it folds into the ds term
        ds = p * (dp - delta + dlse_ref[0, 0]) * scale
        dq_acc[...] += jax.lax.dot_general(ds.astype(k.dtype), k,
                                           (((1,), (0,)), ((), ())),
                                           preferred_element_type=jnp.float32)

    @pl.when(jk == n_k - 1)
    def _finish():
        dq_ref[0, 0] = dq_acc[...].astype(dq_ref.dtype)


def _bwd_dkv_kernel(lengths_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                    dlse_ref, dk_ref, dv_ref, dk_acc, dv_acc,
                    *, scale, block_q, block_k, n_q, causal):
    b, h, jk, iq = (pl.program_id(0), pl.program_id(1), pl.program_id(2),
                    pl.program_id(3))

    @pl.when(iq == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    length = lengths_ref[b]
    q_start, k_start = iq * block_q, jk * block_k
    should_run = True
    if causal:
        should_run = q_start + block_q - 1 >= k_start

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0]                       # [BQ, 1]
        delta = delta_ref[0, 0]                   # [BQ, 1]

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        col = k_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        mask = col < length
        if causal:
            row = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            mask = jnp.logical_and(mask, col <= row)
        p = jnp.exp(s - lse)
        p = jnp.where(mask, p, 0.0)

        # dV += P^T dO ; dS = P*(dP - delta) ; dK += dS^T Q * scale
        dv_acc[...] += jax.lax.dot_general(p.astype(do.dtype), do,
                                           (((0,), (0,)), ((), ())),
                                           preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        # dlse: cotangent of the logsumexp output (ring-attention combines);
        # d lse_i / d s_ij = p_ij, so it folds into the ds term
        ds = p * (dp - delta + dlse_ref[0, 0]) * scale
        dk_acc[...] += jax.lax.dot_general(ds.astype(q.dtype), q,
                                           (((0,), (0,)), ((), ())),
                                           preferred_element_type=jnp.float32)

    @pl.when(iq == n_q - 1)
    def _finish():
        dk_ref[0, 0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[...].astype(dv_ref.dtype)


def _bwd(causal, block_q, block_k, scale_opt, res, g):
    q, k, v, lengths, o, lse = res
    do, dlse = g
    if dlse is None:
        dlse = jnp.zeros_like(lse)
    dlse = dlse.astype(jnp.float32)
    B, H, T, Dh = q.shape
    KV, S = k.shape[1], k.shape[2]
    group = H // KV
    scale = scale_opt if scale_opt is not None else Dh ** -0.5
    n_q, n_k = _cdiv(T, block_q), _cdiv(S, block_k)

    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1, keepdims=True)  # [B,H,T,1]

    # Causal same-length case: triangle grid (half the programs, no dead DMA).
    # Square block, clamped to 512 (see the VMEM-stack note in _fwd).
    if causal and T == S:
        blk = min(block_q, block_k, 512)
        if T % blk == 0 and T // blk >= 2:
            return _bwd_tri(q, k, v, lengths, do, lse, delta, dlse, scale, blk)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, block_q=block_q,
                          block_k=block_k, n_k=n_k, causal=causal),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H, n_q, n_k),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, Dh), lambda b, h, i, j, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, block_k, Dh), lambda b, h, i, j, *_: (b, h // group, j, 0)),
                pl.BlockSpec((1, 1, block_k, Dh), lambda b, h, i, j, *_: (b, h // group, j, 0)),
                pl.BlockSpec((1, 1, block_q, Dh), lambda b, h, i, j, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, block_q, 1), lambda b, h, i, j, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, block_q, 1), lambda b, h, i, j, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, block_q, 1), lambda b, h, i, j, *_: (b, h, i, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, Dh),
                                   lambda b, h, i, j, *_: (b, h, i, 0)),
            scratch_shapes=[pltpu.VMEM((block_q, Dh), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, T, Dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(lengths, q, k, v, do, lse, delta, dlse)

    # dk/dv per q-head, folded onto kv heads afterwards (cheap XLA reduce)
    dk_h, dv_h = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, block_q=block_q,
                          block_k=block_k, n_q=n_q, causal=causal),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H, n_k, n_q),
            in_specs=[
                pl.BlockSpec((1, 1, block_q, Dh), lambda b, h, j, i, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, block_k, Dh), lambda b, h, j, i, *_: (b, h // group, j, 0)),
                pl.BlockSpec((1, 1, block_k, Dh), lambda b, h, j, i, *_: (b, h // group, j, 0)),
                pl.BlockSpec((1, 1, block_q, Dh), lambda b, h, j, i, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, block_q, 1), lambda b, h, j, i, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, block_q, 1), lambda b, h, j, i, *_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, block_q, 1), lambda b, h, j, i, *_: (b, h, i, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, block_k, Dh), lambda b, h, j, i, *_: (b, h, j, 0)),
                pl.BlockSpec((1, 1, block_k, Dh), lambda b, h, j, i, *_: (b, h, j, 0)),
            ],
            scratch_shapes=[pltpu.VMEM((block_k, Dh), jnp.float32),
                            pltpu.VMEM((block_k, Dh), jnp.float32)],
        ),
        out_shape=[jax.ShapeDtypeStruct((B, H, S, Dh), q.dtype),
                   jax.ShapeDtypeStruct((B, H, S, Dh), q.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(lengths, q, k, v, do, lse, delta, dlse)

    dk = dk_h.reshape(B, KV, group, S, Dh).sum(axis=2).astype(k.dtype)
    dv = dv_h.reshape(B, KV, group, S, Dh).sum(axis=2).astype(v.dtype)
    return dq, dk, dv, None


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9))
def _flash(q, k, v, lengths, causal, block_q, block_k, block_q_bwd,
           block_k_bwd, scale_opt):
    """Returns (o, lse [B,H,T,1]); both differentiable (the lse cotangent
    feeds ring-attention chunk combining)."""
    return _flash_fwd(q, k, v, lengths, causal, block_q, block_k, scale_opt)[0]


def _flash_fwd(q, k, v, lengths, causal, block_q, block_k, scale_opt):
    scale = scale_opt if scale_opt is not None else q.shape[-1] ** -0.5
    o, lse = _fwd(q, k, v, lengths, scale, causal, block_q, block_k)
    # Residuals tagged for remat policies ("..._save_attn" in models/llama.py):
    # saving o+lse lets gradient checkpointing skip re-running the forward
    # kernel in the backward pass (the flash bwd recomputes scores from lse
    # anyway, so o/lse are the only kernel outputs the VJP needs).
    o = checkpoint_name(o, "flash_attn_out")
    lse = checkpoint_name(lse, "flash_attn_out")
    return (o, lse), (q, k, v, lengths, o, lse)


def _flash_fwd_rule(q, k, v, lengths, causal, block_q, block_k, block_q_bwd,
                    block_k_bwd, scale_opt):
    return _flash_fwd(q, k, v, lengths, causal, block_q, block_k, scale_opt)


def _flash_bwd_rule(causal, block_q, block_k, block_q_bwd, block_k_bwd,
                    scale_opt, res, g):
    return _bwd(causal, block_q_bwd, block_k_bwd, scale_opt, res, g)


_flash.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def flash_attention(
    q: jnp.ndarray,                     # [B, T, H, Dh]
    k: jnp.ndarray,                     # [B, S, KV, Dh]
    v: jnp.ndarray,
    attn_mask: Optional[jnp.ndarray] = None,  # [B, S] right-padded validity
    causal: bool = True,
    block_q: int = 1024,
    block_k: int = 1024,
    block_q_bwd: int = 512,
    block_k_bwd: int = 1024,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Model-layout wrapper. Returns [B, T, H, Dh]. Default block sizes tuned
    on v5e at the 8B attention shapes (T=4096, H=32, KV=8, Dh=128): fwd+bwd
    9.3 ms vs 34.7 ms for the XLA path (3.7x); 1024-blocks beat 512 by ~10%
    and also hold at T=2048 (blocks are min()-clamped to T).

    NOTE on the causal T==S fast path: when the triangle-grid kernels apply
    (T % tri_block == 0 with >= 2 blocks per side), the block arguments above
    are NOT used directly — the triangle forward uses
    min(block_q, $FLASH_TRI_BLOCK [512]) x $FLASH_TRI_BLOCK_K [1024] and the
    triangle backward uses min(block_q_bwd, block_k_bwd, 512) square blocks
    (VMEM-stack limits; see _fwd). Tune the triangle path via those env vars
    (scripts/sweep_flash_block.py does)."""
    B, T, H, Dh = q.shape
    S = k.shape[1]
    if attn_mask is None:
        lengths = jnp.full((B,), S, jnp.int32)
    else:
        lengths = attn_mask.astype(jnp.int32).sum(axis=-1)
    block_q = min(block_q, T)
    block_k = min(block_k, S)
    block_q_bwd = min(block_q_bwd, T)
    block_k_bwd = min(block_k_bwd, S)
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    o, _ = _flash(qt, kt, vt, lengths, causal, block_q, block_k,
                  block_q_bwd, block_k_bwd, scale)
    return o.transpose(0, 2, 1, 3)


def flash_attention_with_lse(q, k, v, lengths=None, causal=True,
                             block_q=512, block_k=512, block_q_bwd=512,
                             block_k_bwd=1024, scale=None):
    """Kernel-layout entry ([B,H,T,Dh]) returning (o, lse [B,H,T]); both
    outputs differentiable. Building block for ring attention."""
    B, H, T, Dh = q.shape
    S = k.shape[2]
    if lengths is None:
        lengths = jnp.full((B,), S, jnp.int32)
    o, lse = _flash(q, k, v, lengths, causal, min(block_q, T), min(block_k, S),
                    min(block_q_bwd, T), min(block_k_bwd, S), scale)
    return o, lse[..., 0]


def flash_attention_sharded(
    q: jnp.ndarray,                     # [B, T, H, Dh]
    k: jnp.ndarray,                     # [B, S, KV, Dh]
    v: jnp.ndarray,
    attn_mask: Optional[jnp.ndarray] = None,
    causal: bool = True,
    **kw,
) -> jnp.ndarray:
    """Multichip entry: when a mesh is registered (parallel.context), wrap the
    kernel in shard_map — batch over (data, fsdp), heads over tensor — so
    GSPMD keeps shards local instead of replicating around the opaque
    pallas_call. Falls back to the plain kernel without a mesh."""
    from jax.sharding import PartitionSpec as P

    from metamorph_tpu.parallel.context import get_current_mesh

    mesh = get_current_mesh()
    if mesh is None:
        return flash_attention(q, k, v, attn_mask=attn_mask, causal=causal, **kw)

    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    dp = tuple(a for a in ("data", "fsdp") if sizes.get(a, 1) > 1)
    tp = "tensor" if sizes.get("tensor", 1) > 1 else None
    B, H, KV = q.shape[0], q.shape[2], k.shape[2]
    dp_size = 1
    for a in dp:
        dp_size *= sizes[a]
    # only shard dims that divide evenly; otherwise drop that axis
    if B % max(dp_size, 1) != 0:
        dp = ()
    if tp and (H % sizes["tensor"] != 0 or KV % sizes["tensor"] != 0):
        tp = None
    if not dp and not tp:
        return flash_attention(q, k, v, attn_mask=attn_mask, causal=causal, **kw)

    bspec = dp if dp else None
    q_spec = P(bspec, None, tp, None)
    kv_spec = P(bspec, None, tp, None)
    mask_spec = P(bspec)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(q_spec, kv_spec, kv_spec, mask_spec),
        out_specs=q_spec, check_vma=False)
    def mapped(q, k, v, m):
        return flash_attention(q, k, v, attn_mask=m, causal=causal, **kw)

    if attn_mask is None:
        attn_mask = jnp.ones((B, k.shape[1]), jnp.int32)
    return mapped(q, k, v, attn_mask)
