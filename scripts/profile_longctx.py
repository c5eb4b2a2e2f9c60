#!/usr/bin/env python
"""Decompose the T=16k B=1 600m train step: time each segment's fwd+bwd
alone on the chip (flash attention kernel, decoder stack minus CE, chunked
CE) to show where the 16k step spends its time (the r3 verdict's ask).

Each timed rep gets a FRESH random input (different PRNG key): the remote
TPU runtime caches results of identical (executable, inputs) executions
across processes, and additive bf16 salts quantize away at small epsilons.

    python scripts/profile_longctx.py            # save_attn remat, chunk 512
    PROF_REMAT=dots_no_batch PROF_CE_CHUNK=256 python scripts/profile_longctx.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from metamorph_tpu.config import (LlamaConfig, MetaMorphConfig,
                                  MultimodalConfig, SiglipConfig, TrainConfig)
from metamorph_tpu.models import llama as L
from metamorph_tpu.models import metamorph as M
from metamorph_tpu.ops.flash_attention import flash_attention

llama = LlamaConfig(vocab_size=128258, hidden_size=1280,
                    intermediate_size=5120, num_layers=12,
                    num_heads=10, num_kv_heads=5, head_dim=128,
                    rope_scaling=False)
B = int(os.environ.get("PROF_BATCH", "1"))
T = int(os.environ.get("PROF_SEQLEN", "16384"))
REMAT = os.environ.get("PROF_REMAT", "dots_no_batch_save_attn")
CE_CHUNK = int(os.environ.get("PROF_CE_CHUNK", "512"))
# per-pid base key: defeats the CROSS-process result cache too
BASE = os.getpid() * 1009


def timeit(name, fn, make_args, reps=3):
    """fn compiled once; each rep times fn on freshly generated inputs.
    fn must return a SCALAR: float() forces the device round-trip (on the
    remote axon runtime block_until_ready does not actually block)."""
    float(fn(*make_args(BASE)))                          # compile + warmup
    ts = []
    for i in range(1, reps + 1):
        args = make_args(BASE + i)
        [float(jnp.asarray(a).reshape(-1)[0]) if hasattr(a, 'dtype')
         else a for a in args]                           # inputs resident
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1000:.1f} ms", flush=True)
    return min(ts)


dt = jnp.bfloat16
shp_q = (B, T, llama.num_heads, llama.head_dim)
shp_kv = (B, T, llama.num_kv_heads, llama.head_dim)


def mk_qkv(seed):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return (jax.random.normal(ks[0], shp_q, dt),
            jax.random.normal(ks[1], shp_kv, dt),
            jax.random.normal(ks[2], shp_kv, dt))


@jax.jit
def attn_fwd(q, k, v):
    return flash_attention(q, k, v, causal=True).astype(jnp.float32).sum()


@jax.jit
def attn_grad(q, k, v):
    g = jax.grad(lambda q, k, v: flash_attention(
        q, k, v, causal=True).astype(jnp.float32).sum())(q, k, v)
    return g.astype(jnp.float32).sum()


t_attn_f = timeit("flash fwd (1 layer)", attn_fwd, mk_qkv)
t_attn_g = timeit("flash fwd+bwd (1 layer)", attn_grad, mk_qkv)

# decoder stack fwd+bwd under the remat policy, loss = sum(hidden) (no CE)
params = L.init_llama_params(jax.random.PRNGKey(0), llama, dtype=dt)
pos = jnp.arange(T, dtype=jnp.int32)[None]
mask = jnp.ones((B, T), jnp.int32)


def mk_emb(seed):
    return (params, jax.random.normal(jax.random.PRNGKey(seed),
                                      (B, T, llama.hidden_size), dt))


@jax.jit
def stack_grad(params, emb):
    def loss(p, e):
        h = L.llama_forward(p, llama, e, pos, mask, attn_impl="flash",
                            remat=True, remat_policy=REMAT)
        return h.astype(jnp.float32).sum()
    return jax.grad(loss, argnums=1)(params, emb).astype(jnp.float32).sum()


t_stack = timeit("decoder stack fwd+bwd (no CE)", stack_grad, mk_emb)

# chunked CE alone on a random hidden
labels = jnp.asarray(
    np.random.default_rng(0).integers(0, 128256, (B, T)), jnp.int32)
cfg_full = MetaMorphConfig(llama=llama, siglip=SiglipConfig(),
                           mm=MultimodalConfig(num_image_tokens=64),
                           train=TrainConfig(max_seq_len=T, batch_size=B,
                                             ce_chunk=CE_CHUNK))


def mk_hidden(seed):
    return ({"llama": params},
            jax.random.normal(jax.random.PRNGKey(seed),
                              (B, T, llama.hidden_size), dt))


@jax.jit
def ce_grad(mp, hidden):
    g = jax.grad(lambda mp, h: M._chunked_ce(
        mp, cfg_full, h, labels, chunk=CE_CHUNK))(
            mp, hidden)["llama"]["lm_head"]["kernel"]
    return g.astype(jnp.float32).sum()


t_ce = timeit(f"chunked CE fwd+bwd (chunk={CE_CHUNK})", ce_grad, mk_hidden)

print(f"\nB={B} T={T} remat={REMAT}: attn x12 {12*t_attn_g*1000:.0f} ms "
      f"(inside stack) | stack(noCE) {t_stack*1000:.0f} ms | "
      f"CE {t_ce*1000:.0f} ms | stack+CE {1000*(t_stack+t_ce):.0f} ms",
      flush=True)
