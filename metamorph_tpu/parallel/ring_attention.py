"""Ring attention: sequence-parallel causal flash attention over a mesh axis.

The long-context stretch goal (SURVEY.md §5.7/§7): the sequence dim is sharded
over a `sequence` mesh axis; each device runs the Pallas flash kernel on its
local Q against K/V chunks that rotate around the ring via `lax.ppermute`
(XLA lowers the permute onto ICI neighbor links), merging partial results with
the standard logsumexp combine. Fully differentiable — the flash kernel
exposes lse with a backward path, so jax.grad composes through the ring.

Causality at chunk granularity (equal-sized chunks):
  * source chunk index  < mine: full (unmasked) attention;
  * source chunk index == mine: causal attention (the diagonal);
  * source chunk index  > mine: skipped (lse = -inf contribution).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from metamorph_tpu.ops.flash_attention import NEG_INF, flash_attention_with_lse


def _merge(o1, l1, o2, l2):
    """Combine two partial attention results via logsumexp weighting.
    o: [B,H,T,Dh]; l: [B,H,T] (NEG_INF marks an empty contribution)."""
    m = jnp.maximum(l1, l2)
    e1 = jnp.exp(l1 - m)
    e2 = jnp.exp(l2 - m)
    denom = jnp.maximum(e1 + e2, 1e-38)
    o = (o1 * e1[..., None] + o2 * e2[..., None]) / denom[..., None]
    return o, m + jnp.log(denom)


def _ring_body(q, k, v, axis_name: str, block_q: int, block_k: int):
    """Runs inside shard_map. q/k/v: [B, H, T_loc, Dh] local shards."""
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.psum(1, axis_name)
    B, H, T, Dh = q.shape

    def full_chunk(kv):
        kt, vt = kv
        return flash_attention_with_lse(q, kt, vt, causal=False,
                                        block_q=block_q, block_k=block_k)

    def diag_chunk(kv):
        kt, vt = kv
        return flash_attention_with_lse(q, kt, vt, causal=True,
                                        block_q=block_q, block_k=block_k)

    def skip_chunk(kv):
        return (jnp.zeros((B, H, T, Dh), q.dtype),
                jnp.full((B, H, T), NEG_INF, jnp.float32))

    def step(i, carry):
        o, lse, kv = carry
        src = (idx - i) % n   # owner of the kv chunk currently held
        case = jnp.where(src == idx, 1, jnp.where(src < idx, 0, 2))
        o_c, l_c = jax.lax.switch(case, [full_chunk, diag_chunk, skip_chunk], kv)
        o, lse = _merge(o, lse, o_c.astype(jnp.float32), l_c)
        kv = jax.lax.ppermute(
            kv, axis_name, [(j, (j + 1) % n) for j in range(n)])
        return o, lse, kv

    o0 = jnp.zeros((B, H, T, Dh), jnp.float32)
    l0 = jnp.full((B, H, T), NEG_INF, jnp.float32)
    o, lse, _ = jax.lax.fori_loop(0, n, step, (o0, l0, (k, v)))
    return o.astype(q.dtype)


def ring_attention(
    q: jnp.ndarray,          # [B, T, H, Dh] — T sharded over `axis_name`
    k: jnp.ndarray,          # [B, T, KV, Dh]
    v: jnp.ndarray,
    mesh: Mesh,
    axis_name: str = "fsdp",
    batch_axis: Optional[str] = None,
    block_q: int = 512,
    block_k: int = 512,
) -> jnp.ndarray:
    """shard_map wrapper: causal attention over a sequence 4x (or more) longer
    than one device can hold. Returns [B, T, H, Dh], same sharding as q.
    `batch_axis` additionally shards the batch dim (DP x SP training mode)."""
    seq_spec = P(batch_axis, axis_name, None, None)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(seq_spec, seq_spec, seq_spec),
        out_specs=seq_spec,
        check_vma=False)  # pallas_call outputs don't carry vma metadata yet
    def mapped(q, k, v):
        qt = q.transpose(0, 2, 1, 3)
        kt = k.transpose(0, 2, 1, 3)
        vt = v.transpose(0, 2, 1, 3)
        o = _ring_body(qt, kt, vt, axis_name, block_q, block_k)
        return o.transpose(0, 2, 1, 3)

    return mapped(q, k, v)
