"""Isolate the serve-decode ragged KV-write cost at serve shapes.

The axon remote backend's block_until_ready does NOT wait for execution —
only a data fetch synchronizes. So: dispatch n salted calls back-to-back,
fetch one scalar that depends on all of them, subtract the measured
round-trip.  Strategies compared (600m geometry, B=8, S=4096, 12 layers,
k+v): per-row advanced-indexing scatter (current serve path), unrolled
per-row dynamic_update_slice, one-hot dense rewrite, and a no-write
baseline.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import bench
from metamorph_tpu.models import llama as L


def fetch_timed(fn, args, n=10):
    """Returns per-call ms with the chain fetch-synchronized."""
    out = fn(jnp.float32(-1.0), *args)
    _ = float(out if out.ndim == 0 else out.reshape(-1)[0])
    t = time.monotonic()
    for i in range(n):
        out = fn(jnp.float32(i), *args)
    _ = float(out if out.ndim == 0 else out.reshape(-1)[0])
    return (time.monotonic() - t) / n * 1e3


def main():
    cfg, _ = bench.build_cfg()
    lcfg = cfg.llama
    B, S, REP = 8, 4096, 16
    cache = L.init_kv_cache(lcfg, B, S)
    k1 = jnp.zeros((B, lcfg.num_kv_heads, lcfg.head_dim), jnp.bfloat16)
    lens = jnp.full((B,), 1000, jnp.int32)
    b_idx = jnp.arange(B)
    KV, Dh = lcfg.num_kv_heads, lcfg.head_dim

    def write_scatter(ck, k1, lens):
        for l in range(lcfg.num_layers):
            ck = ck.at[l, b_idx, :, lens].set(k1)
        return ck

    def write_dus(ck, k1, lens):
        for l in range(lcfg.num_layers):
            for b in range(B):
                ck = jax.lax.dynamic_update_slice(
                    ck, k1[b].reshape(1, 1, KV, 1, Dh),
                    (l, b, 0, lens[b], 0))
        return ck

    def write_onehot(ck, k1, lens):
        oh = jnp.arange(S)[None] == lens[:, None]            # [B, S]
        upd = jnp.where(oh[:, None, :, None],
                        k1[:, :, None, :].astype(ck.dtype), 0)
        return jnp.where(oh[None, :, None, :, None], upd[None], ck)

    def write_none(ck, k1, lens):
        return ck

    for name, writer in (("none", write_none), ("scatter", write_scatter),
                         ("dus", write_dus), ("onehot", write_onehot)):
        @jax.jit
        def stepper(salt, cache, k1, lens):
            k1 = k1 + salt.astype(k1.dtype)
            def one(carry, _):
                ck, cv = carry
                ck = writer(ck, k1, lens)
                cv = writer(cv, k1, lens)
                return (ck, cv), None
            (ck, cv), _ = jax.lax.scan(
                one, (cache["k"], cache["v"]), None, length=REP)
            return ck[0, 0, 0, 1000, 0] + cv[0, 0, 0, 1000, 0]
        ms = fetch_timed(stepper, (cache, k1, lens), n=5)
        print(f"{name:8s}: {ms/REP:7.3f} ms/step (k+v, 12 layers)")


if __name__ == "__main__":
    main()
