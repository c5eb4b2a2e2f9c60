"""Profile the serve engine's long-context regime: where does wall time go?

Wraps the engine's compiled entry points (_prefill_admit, _decode_all,
_decode_fill_all, _status) with block_until_ready timers and prints a
per-phase breakdown. Run on the TPU chip:

    python scripts/profile_serve.py [--t0 2048 --cache 4096 --req 24]
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from metamorph_tpu.inference import serve as S
from metamorph_tpu.inference.serve import Request, ServeEngine
from metamorph_tpu.models import llama as L
from metamorph_tpu.models.metamorph import init_metamorph_params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t0", type=int, default=2048)
    ap.add_argument("--new", type=int, default=128)
    ap.add_argument("--cache", type=int, default=4096)
    ap.add_argument("--req", type=int, default=24)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--sync", type=int, default=16)
    ap.add_argument("--fill", type=int, default=0)
    ap.add_argument("--quant", action="store_true")
    args = ap.parse_args()

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench
    cfg, _ = bench.build_cfg()
    params = init_metamorph_params(jax.random.PRNGKey(0), cfg,
                                   dtype=jnp.bfloat16)
    if args.quant:
        from metamorph_tpu.ops.quant import quantize_llama_decode
        params = dict(params)
        params["llama"] = quantize_llama_decode(params["llama"])

    rng = np.random.default_rng(0)
    reqs = []
    for i in range(args.req):
        t0 = int(rng.integers(args.t0 // 5, args.t0))
        budget = int(rng.integers(args.new // 4, args.new))
        ids = rng.integers(10, 100000, (t0,)).astype(np.int32)
        reqs.append(Request(prompt_ids=ids, max_new_tokens=budget, uid=i))

    stats = {}

    def wrap(name, fn, state_pos=1):
        def inner(*a, **k):
            t = time.monotonic()
            out = fn(*a, **k)
            jax.block_until_ready(out)
            dt = time.monotonic() - t
            n, tot = stats.get(name, (0, 0.0))
            stats[name] = (n + 1, tot + dt)
            return out
        return inner

    orig = (S._prefill_admit, S._prefill_admit_ids, S._decode_all,
            S._decode_fill_all, S._decode_fill_all_ids, S._snapshot)
    S._prefill_admit = wrap("prefill_admit", S._prefill_admit)
    S._prefill_admit_ids = wrap("prefill_admit_ids", S._prefill_admit_ids)
    S._decode_all = wrap("decode_all", S._decode_all)
    S._decode_fill_all = wrap("decode_fill_all", S._decode_fill_all)
    S._decode_fill_all_ids = wrap("decode_fill_all_ids", S._decode_fill_all_ids)
    S._snapshot = wrap("snapshot", S._snapshot)

    def run():
        buckets = tuple(b for b in (64, 128, 256, 512, 1024, 2048)
                        if b <= args.t0) or (args.t0,)
        eng = ServeEngine(params, cfg, n_slots=args.slots,
                          max_cache_len=args.cache,
                          max_new_tokens_cap=args.new, max_images=1,
                          prefill_buckets=buckets,
                          steps_per_sync=args.sync, fill_chunk=args.fill)
        for r in reqs:
            eng.submit(r)
        done = eng.run()
        return sum(c.steps for c in done)

    t = time.monotonic()
    total = run()
    print(f"warmup: {time.monotonic()-t:.1f}s total_new={total}")
    stats.clear()
    t = time.monotonic()
    total = run()
    wall = time.monotonic() - t
    print(f"timed:  {wall:.2f}s total_new={total} -> {total/wall:.1f} tok/s")
    acc = 0.0
    for k, (n, tot) in sorted(stats.items(), key=lambda kv: -kv[1][1]):
        acc += tot
        print(f"  {k:18s} calls={n:5d} total={tot:7.2f}s "
              f"mean={1e3*tot/max(n,1):7.1f}ms")
    print(f"  {'(python/other)':18s}              total={wall-acc:7.2f}s")
    (S._prefill_admit, S._prefill_admit_ids, S._decode_all,
     S._decode_fill_all, S._decode_fill_all_ids, S._snapshot) = orig


if __name__ == "__main__":
    main()
