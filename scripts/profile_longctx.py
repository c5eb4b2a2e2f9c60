#!/usr/bin/env python
"""Decompose the T=16k B=1 600m train step with SCAN-AMORTIZED segment
timing: the remote-TPU dispatch roundtrip is ~30 ms (measured: a trivial
jitted add on a [128] vector takes 32 ms end-to-end), so single-dispatch
timings of <100 ms kernels are dominated by the tunnel, not the chip.
Each segment here runs REPS times inside ONE jitted lax.scan (inputs
perturbed per iteration so the remote result cache can't replay), and the
per-rep time is (t_total - DISPATCH_MS) / REPS.

    python scripts/profile_longctx.py
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
REPS = int(os.environ.get("PROF_REPS", "8"))
DISPATCH_MS = 30.0
BASE = os.getpid() * 1009


def scan_timeit(name, step_fn, init_args):
    """step_fn(i, *args) -> scalar; scanned REPS times in one dispatch."""

    @jax.jit
    def run(args):
        def body(carry, i):
            return carry + step_fn(i, *args), None

        total, _ = jax.lax.scan(body, jnp.float32(0.0),
                                jnp.arange(REPS, dtype=jnp.int32))
        return total

    float(run(init_args))                                # compile + warmup
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        float(run(init_args))
        ts.append(time.perf_counter() - t0)
    per = (min(ts) * 1000 - DISPATCH_MS) / REPS
    print(f"{name}: {per:.1f} ms/rep  (raw {min(ts)*1000:.0f} ms / {REPS})",
          flush=True)
    return per


dt = jnp.bfloat16
key = jax.random.PRNGKey(BASE)
q0 = jax.random.normal(key, (B, T, llama.num_heads, llama.head_dim), dt)
kv0 = jax.random.normal(key, (B, T, llama.num_kv_heads, llama.head_dim), dt)
params = L.init_llama_params(jax.random.PRNGKey(0), llama, dtype=dt)
pos = jnp.arange(T, dtype=jnp.int32)[None]
amask = jnp.ones((B, T), jnp.int32)
emb0 = jax.random.normal(key, (B, T, llama.hidden_size), dt)
labels = jnp.asarray(
    np.random.default_rng(0).integers(0, 128256, (B, T)), jnp.int32)
cfg_full = MetaMorphConfig(llama=llama, siglip=SiglipConfig(),
                           mm=MultimodalConfig(num_image_tokens=64),
                           train=TrainConfig(max_seq_len=T, batch_size=B,
                                             ce_chunk=CE_CHUNK))
ids0 = jnp.asarray(
    np.random.default_rng(1).integers(0, 128256, (B, T)), jnp.int32)


def salt(x, i):
    return x + (i.astype(jnp.float32) * 1e-3).astype(x.dtype)


# 1) flash attention kernel, fwd and fwd+bwd (one layer)
scan_timeit("flash fwd (1 layer)",
            lambda i, q, k, v: flash_attention(
                salt(q, i), k, v, causal=True).astype(jnp.float32).sum(),
            (q0, kv0, kv0))
scan_timeit("flash fwd+bwd (1 layer)",
            lambda i, q, k, v: jax.grad(lambda q: flash_attention(
                q, k, v, causal=True).astype(jnp.float32).sum())(
                    salt(q, i)).astype(jnp.float32).sum(),
            (q0, kv0, kv0))


# 2) decoder stack fwd+bwd under the remat policy (no CE)
def stack_loss(p, e):
    h = L.llama_forward(p, llama, e, pos, amask, attn_impl="flash",
                        remat=True, remat_policy=REMAT)
    return h.astype(jnp.float32).sum()


scan_timeit("decoder stack fwd+bwd (no CE)",
            lambda i, p, e: jax.grad(stack_loss, argnums=1)(
                p, salt(e, i)).astype(jnp.float32).sum(),
            (params, emb0))


# 3) chunked CE fwd+bwd on a random hidden (lm_head wgrad included)
def ce_loss(mp, h):
    return M._chunked_ce(mp, cfg_full, h, labels, chunk=CE_CHUNK)


scan_timeit(f"chunked CE fwd+bwd (chunk={CE_CHUNK})",
            lambda i, mp, h: jax.grad(ce_loss, argnums=1)(
                mp, salt(h, i)).astype(jnp.float32).sum(),
            ({"llama": params}, emb0))


# 4) embedding lookup fwd+bwd (the 16k-token embed wgrad: XLA may lower
#    the take-grad as a one-hot fp32 matmul — a silent 100ms-class cost)
def embed_loss(emb_table, ids):
    # quadratic so the wgrad depends on the (salted) table values — a linear
    # loss has a constant cotangent and XLA hoists the whole grad out of the
    # timing scan as loop-invariant
    x = jnp.take(emb_table, ids, axis=0)
    return jnp.square(x.astype(jnp.float32)).sum()


scan_timeit("embed lookup fwd+wgrad",
            lambda i, tbl, ids: jax.grad(embed_loss)(
                salt(tbl, i), ids).astype(jnp.float32).sum(),
            (params["embed"]["embedding"], ids0))


# 5/6/7) full loss fwd+bwd, full train step (adds Adam), SigLIP encode —
#        the bench's exact 16k batch shape (2 images per row)
if os.environ.get("PROF_FULL", "1") == "1":
    import bench as bench_mod
    from metamorph_tpu.models.metamorph import init_metamorph_params
    from metamorph_tpu.models import siglip as S
    from metamorph_tpu.train.optimizer import make_optimizer
    from metamorph_tpu.train.train_step import (init_train_state, loss_fn,
                                                train_step)
    import dataclasses, functools

    cfg = dataclasses.replace(
        cfg_full, train=dataclasses.replace(
            cfg_full.train, remat=True, remat_policy=REMAT,
            max_images_per_batch=2 * B))
    mparams = init_metamorph_params(jax.random.PRNGKey(0), cfg,
                                    dtype=jnp.bfloat16)
    batch, pixels = bench_mod.build_batch(cfg)

    def full_loss(p, px):
        total, _ = loss_fn(p, cfg, batch, px, attn_impl="flash")
        return total

    def full_loss_grad(i, p, px):
        # grad wrt PARAMS (the tower is frozen, so pixel grads are zero and
        # XLA DCEs the whole thing); salt a param leaf so nothing is
        # loop-invariant; reduce one representative grad leaf
        p = dict(p)
        p["llama"] = dict(p["llama"])
        p["llama"]["final_norm"] = {
            "scale": salt(p["llama"]["final_norm"]["scale"], i)}
        g = jax.grad(full_loss)(p, px)
        return g["llama"]["layers"]["mlp"]["w_down"].astype(
            jnp.float32).sum()

    scan_timeit("FULL loss fwd+bwd (metamorph_forward)",
                full_loss_grad, (mparams, pixels))

    scan_timeit("siglip encode fwd (2 imgs)",
                lambda i, p, px: S.siglip_encode(
                    p["siglip"], cfg.siglip, salt(px, i)
                ).astype(jnp.float32).sum(),
                (mparams, pixels))

    tx = make_optimizer(cfg.train, mparams)
    state0 = init_train_state(mparams, cfg)
    step_fn = jax.jit(functools.partial(train_step, cfg=cfg, tx=tx,
                                        attn_impl="flash"))

    @jax.jit
    def run_steps(state, px):
        def body(st, i):
            st, _ = step_fn(st, batch, salt(px, i))
            return st, None

        st, _ = jax.lax.scan(body, state,
                             jnp.arange(REPS, dtype=jnp.int32))
        # depend on updated params, not just the counter — scan dead-carry
        # elimination would otherwise drop the entire optimizer update
        return (st["step"].astype(jnp.float32)
                + st["params"]["llama"]["layers"]["mlp"]["w_down"].astype(
                    jnp.float32).sum())

    float(run_steps(state0, pixels))
    t0 = time.perf_counter()
    float(run_steps(state0, pixels))
    t = (time.perf_counter() - t0) * 1000
    print(f"FULL train step (loss+Adam): {(t - DISPATCH_MS)/REPS:.1f} ms/rep "
          f"(raw {t:.0f} ms / {REPS})", flush=True)
