#!/usr/bin/env python
"""Run the full extra-bench matrix SERIALLY on the local chip and assemble
BENCH_EXTRA_r{N}.json (same keys as round 2's artifact, refreshed).

    python scripts/bench_extra.py --out BENCH_EXTRA_r03.json [--only k1,k2]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MATRIX = {
    "train_600m": {},
    "train_600m_offload": {"BENCH_OFFLOAD": "1"},
    "decode": {"BENCH_MODE": "decode"},
    "decode_int8_b1": {"BENCH_MODE": "decode", "BENCH_DECODE_QUANT": "1"},
    "decode_batched_8": {"BENCH_MODE": "decode", "BENCH_DECODE_BATCH": "8",
                         "BENCH_DECODE_T0": "3968"},
    "decode_int8_b8_4k": {"BENCH_MODE": "decode", "BENCH_DECODE_QUANT": "1",
                          "BENCH_DECODE_BATCH": "8", "BENCH_DECODE_T0": "3968"},
    "decode_int8w_int8kv_b8_4k": {"BENCH_MODE": "decode",
                                  "BENCH_DECODE_QUANT": "1",
                                  "BENCH_KV_INT8": "1",
                                  "BENCH_DECODE_BATCH": "8",
                                  "BENCH_DECODE_T0": "3968"},
    "encode": {"BENCH_MODE": "encode"},
    "serve_600m_8slots": {"BENCH_MODE": "serve"},
    "serve_600m_8slots_int8": {"BENCH_MODE": "serve", "BENCH_SERVE_QUANT": "1"},
    "serve_600m_longctx_int8kv": {"BENCH_MODE": "serve",
                                  "BENCH_SERVE_QUANT": "1",
                                  "BENCH_KV_INT8": "1",
                                  "BENCH_SERVE_T0": "2048",
                                  "BENCH_SERVE_CACHE": "4096",
                                  "BENCH_SERVE_REQUESTS": "24"},
    "serve_600m_longctx_int8": {"BENCH_MODE": "serve", "BENCH_SERVE_QUANT": "1",
                                "BENCH_SERVE_T0": "2048",
                                "BENCH_SERVE_CACHE": "4096",
                                "BENCH_SERVE_REQUESTS": "24"},
    "slice_8b_geometry_b1": {"BENCH_MODE": "8b_slice"},
    "slice_8b_geometry_b2": {"BENCH_MODE": "8b_slice", "BENCH_BATCH": "2"},
    "slice_8b_geometry_l8": {"BENCH_MODE": "8b_slice",
                             "BENCH_SLICE_LAYERS": "8"},
    # long-context recipe: save the flash (o, lse) + post-rope q/k/v and
    # recompute only the wide MLP matmuls (save_attn_qkv) — the freed ~5 GB
    # admits B=2 at T=16k, the best measured config (r5; see docs/TRAIN.md)
    "train_600m_longctx_16k_flash": {"BENCH_SEQLEN": "16384",
                                     "BENCH_BATCH": "2", "BENCH_STEPS": "8",
                                     "BENCH_REMAT": "save_attn_qkv"},
    "decode_b1_cost_decomposition": {"BENCH_MODE": "decode_decomp"},
    "spec_decode_int8": {"BENCH_MODE": "spec_decode",
                         "BENCH_DECODE_QUANT": "1"},
    "spec_decode_int8_b8_4k": {"BENCH_MODE": "spec_decode",
                               "BENCH_DECODE_QUANT": "1",
                               "BENCH_DECODE_BATCH": "8",
                               "BENCH_DECODE_T0": "3968"},
    # speculation evaluated against the STRONGEST plain decode config
    # (int8 weights + int8 KV at B=8/4k — the r03 verdict's missing row)
    "spec_decode_int8w_int8kv_b8_4k": {"BENCH_MODE": "spec_decode",
                                       "BENCH_DECODE_QUANT": "1",
                                       "BENCH_KV_INT8": "1",
                                       "BENCH_DECODE_BATCH": "8",
                                       "BENCH_DECODE_T0": "3968"},
    "render_sd15_512px": {"BENCH_MODE": "render"},
    # per-row adaptive speculation (r4): mixed workload — half the requests
    # carry periodic (drafting-friendly) content on a crafted model, half
    # are random. At the LONG-CONTEXT shape the echo rows' accepted drafts
    # amortize the expensive per-step KV reads, so adaptive must BEAT both
    # no-spec and forced-spec (measured on this chip: 1472 vs 1234 vs 1300
    # tok/s). At the short default shape plain decode is cheap enough that
    # spec never pays — adaptive must CONVERGE TO no-spec there (measured:
    # 1593 ~ 1578 vs 791 forced).
    "serve_mixed_spec_adaptive_4k": {"BENCH_MODE": "serve",
                                     "BENCH_SERVE_CONTENT": "mixed",
                                     "BENCH_SERVE_T0": "2048",
                                     "BENCH_SERVE_CACHE": "4096",
                                     "BENCH_SERVE_NEW": "512",
                                     "BENCH_SERVE_REQUESTS": "16",
                                     "BENCH_SERVE_SPEC_K": "8"},
    "serve_mixed_spec_always_4k": {"BENCH_MODE": "serve",
                                   "BENCH_SERVE_CONTENT": "mixed",
                                   "BENCH_SERVE_T0": "2048",
                                   "BENCH_SERVE_CACHE": "4096",
                                   "BENCH_SERVE_NEW": "512",
                                   "BENCH_SERVE_REQUESTS": "16",
                                   "BENCH_SERVE_SPEC_K": "8",
                                   "BENCH_SERVE_SPEC_FORCE": "always"},
    "serve_mixed_nospec_4k": {"BENCH_MODE": "serve",
                              "BENCH_SERVE_CONTENT": "mixed",
                              "BENCH_SERVE_T0": "2048",
                              "BENCH_SERVE_CACHE": "4096",
                              "BENCH_SERVE_NEW": "512",
                              "BENCH_SERVE_REQUESTS": "16"},
    # the short-shape crossover: spec cannot pay at 8 slots/512 cache, so
    # adaptive must track no-spec while forced-spec halves throughput
    "serve_mixed_spec_adaptive_short": {"BENCH_MODE": "serve",
                                        "BENCH_SERVE_CONTENT": "mixed",
                                        "BENCH_SERVE_SPEC_K": "6"},
    "serve_mixed_spec_always_short": {"BENCH_MODE": "serve",
                                      "BENCH_SERVE_CONTENT": "mixed",
                                      "BENCH_SERVE_SPEC_K": "6",
                                      "BENCH_SERVE_SPEC_FORCE": "always"},
    "serve_mixed_nospec_short": {"BENCH_MODE": "serve",
                                 "BENCH_SERVE_CONTENT": "mixed"},
    # all-random + forced speculation: the cost of NOT adapting (adaptive's
    # counterpart is the plain serve_600m_8slots row + spec_adaptive below)
    "serve_random_spec_always": {"BENCH_MODE": "serve",
                                 "BENCH_SERVE_SPEC_K": "8",
                                 "BENCH_SERVE_SPEC_FORCE": "always"},
    "serve_random_spec_adaptive": {"BENCH_MODE": "serve",
                                   "BENCH_SERVE_SPEC_K": "8"},
    # multi-slot chunked fill (r4): churn-heavy long-prompt admission —
    # queue latency with 1 vs 2 concurrent fills
    "serve_churn_fill1": {"BENCH_MODE": "serve", "BENCH_SERVE_T0": "2048",
                          "BENCH_SERVE_CACHE": "4096",
                          "BENCH_SERVE_REQUESTS": "16",
                          "BENCH_SERVE_FILL": "256",
                          "BENCH_SERVE_MAX_FILLS": "1"},
    "serve_churn_fill2": {"BENCH_MODE": "serve", "BENCH_SERVE_T0": "2048",
                          "BENCH_SERVE_CACHE": "4096",
                          "BENCH_SERVE_REQUESTS": "16",
                          "BENCH_SERVE_FILL": "256",
                          "BENCH_SERVE_MAX_FILLS": "2"},
}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="BENCH_EXTRA_r03.json")
    p.add_argument("--only", default=None,
                   help="comma-separated subset of keys")
    p.add_argument("--timeout", type=int, default=2400)
    args = p.parse_args(argv)

    keys = args.only.split(",") if args.only else list(MATRIX)
    results = {}
    if os.path.exists(args.out):
        results = json.load(open(args.out))
    for k in keys:
        envs = MATRIX[k]
        print(f"[bench_extra] {k} {envs} ...", file=sys.stderr, flush=True)
        env = dict(os.environ, **envs)
        errlog = f"/tmp/bench_extra_{k}.log"   # live progress: tail -f this
        try:
            with open(errlog, "w") as ef:
                r = subprocess.run([sys.executable, "bench.py"], env=env,
                                   stdout=subprocess.PIPE, stderr=ef,
                                   text=True, cwd=REPO, timeout=args.timeout)
            line = None
            for l in reversed(r.stdout.strip().splitlines()):
                try:
                    line = json.loads(l)
                    break
                except json.JSONDecodeError:
                    continue
            results[k] = line or {
                "error": f"rc={r.returncode}",
                "stderr_tail": open(errlog).read().strip().splitlines()[-3:]}
        except subprocess.TimeoutExpired:
            results[k] = {"error": "timeout"}
        with open(args.out, "w") as f:   # checkpoint after every mode
            json.dump(results, f, indent=1)
        print(f"[bench_extra] {k}: {json.dumps(results[k])[:200]}",
              file=sys.stderr, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
