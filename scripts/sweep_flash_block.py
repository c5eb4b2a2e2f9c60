#!/usr/bin/env python
"""Sweep the triangle-fwd block size on the chip at the 16k shape.

Distinguishes per-step-latency-bound (smaller blocks much slower per unit
work) from element-throughput-bound (time ~ constant across block sizes).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B = int(os.environ.get("PROF_BATCH", "1"))
T = int(os.environ.get("PROF_SEQLEN", "16384"))
H, KV, Dh = 10, 5, 128
BASE = os.getpid() * 1009


def mk_qkv(seed):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return (jax.random.normal(ks[0], (B, T, H, Dh), jnp.bfloat16),
            jax.random.normal(ks[1], (B, T, KV, Dh), jnp.bfloat16),
            jax.random.normal(ks[2], (B, T, KV, Dh), jnp.bfloat16))


def timeit(name, fn, reps=3):
    float(fn(*mk_qkv(BASE)))
    ts = []
    for i in range(1, reps + 1):
        args = mk_qkv(BASE + i)
        [float(a.reshape(-1)[0]) for a in args]
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1000:.1f} ms", flush=True)
    return min(ts)


for blk in os.environ.get("SWEEP_BLOCKS", "256,512").split(","):
    os.environ["FLASH_TRI_BLOCK"] = blk
    # re-import per block: _fwd reads the env at trace time
    for m in [m for m in list(sys.modules) if "metamorph_tpu" in m]:
        del sys.modules[m]
    from metamorph_tpu.ops.flash_attention import flash_attention

    @jax.jit
    def fwd(q, k, v):
        return flash_attention(q, k, v, causal=True).astype(jnp.float32).sum()

    @jax.jit
    def grad(q, k, v):
        g = jax.grad(lambda q, k, v: flash_attention(
            q, k, v, causal=True).astype(jnp.float32).sum())(q, k, v)
        return g.astype(jnp.float32).sum()

    timeit(f"tri fwd blk={blk}", fwd)
    timeit(f"tri fwd+bwd blk={blk}", grad)
