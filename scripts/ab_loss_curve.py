#!/usr/bin/env python
"""Train-loss A/B between two repo states on the SAME chip (VERDICT r4
item 5: the r4 snapshot moved rope/silu to activation dtype —
models/llama.py:103-160 — and the flash forward to a log2-domain pre-scale;
CPU fp32 parity passes, but the bf16-on-TPU effect on a real loss curve was
never measured).

Runs the headline bench config (600m, B=4, T=2048, flash attention, bf16
params) for --steps optimizer steps with DETERMINISTIC init (PRNGKey(0)) and
data (bench.build_batch, rng seed 0), recording the fp32 loss each step.
Invoke once per tree, cwd = the tree to measure:

    cd /root/repo        && python scripts/ab_loss_curve.py --out /tmp/head.json
    cd /tmp/r3tree       && python /root/repo/scripts/ab_loss_curve.py --out /tmp/r3.json

then compare:  python scripts/ab_loss_curve.py --compare /tmp/r3.json /tmp/head.json

The comparison reports per-step |Δloss| and a pass verdict: curves overlay
iff max |Δloss| <= --tol (default 0.05, ~bf16 rounding at loss ≈ 12) and the
final losses agree to the same tolerance. Divergent curves mean the numerics
change altered optimization, not just rounding."""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())


def run(steps: int, out: str):
    import functools

    import jax
    import jax.numpy as jnp

    import bench
    from metamorph_tpu.models.metamorph import init_metamorph_params
    from metamorph_tpu.train.optimizer import make_optimizer
    from metamorph_tpu.train.train_step import train_step, init_train_state

    cfg, size = bench.build_cfg()
    assert size == "600m", "A/B pins the headline config"
    params = init_metamorph_params(jax.random.PRNGKey(0), cfg,
                                   dtype=jnp.bfloat16)
    state = init_train_state(params, cfg)
    tx = make_optimizer(cfg.train, params)
    step = jax.jit(functools.partial(train_step, cfg=cfg, tx=tx,
                                     attn_impl="flash"), donate_argnums=(0,))
    batch, pixels = bench.build_batch(cfg)

    losses = []
    t0 = time.time()
    for i in range(steps):
        state, metrics = step(state, batch, pixels)
        losses.append(float(metrics["loss"]))
        if i == 0:
            print(f"compile+step0: {time.time()-t0:.1f}s "
                  f"loss={losses[0]:.4f}", file=sys.stderr)
    rec = {"git": os.popen("git rev-parse --short HEAD").read().strip(),
           "backend": jax.default_backend(),
           "steps": steps, "losses": losses}
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


def compare(a_path: str, b_path: str, tol: float):
    a, b = json.load(open(a_path)), json.load(open(b_path))
    n = min(len(a["losses"]), len(b["losses"]))
    deltas = [abs(a["losses"][i] - b["losses"][i]) for i in range(n)]
    rec = {
        "a": {"git": a["git"], "final_loss": a["losses"][n - 1]},
        "b": {"git": b["git"], "final_loss": b["losses"][n - 1]},
        "steps": n,
        "max_abs_delta": round(max(deltas), 5),
        "final_abs_delta": round(deltas[-1], 5),
        "tol": tol,
        "pass": max(deltas) <= tol,
    }
    print(json.dumps(rec))
    return 0 if rec["pass"] else 1


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--out", default="/tmp/ab_loss.json")
    p.add_argument("--tol", type=float, default=0.05)
    p.add_argument("--compare", nargs=2, metavar=("A", "B"))
    args = p.parse_args(argv)
    if args.compare:
        return compare(*args.compare, tol=args.tol)
    run(args.steps, args.out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
