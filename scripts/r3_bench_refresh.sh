#!/usr/bin/env bash
# Round-3 artifact refresh (run when the TPU tunnel is healthy):
# the new spec-decode rows + the bench_extra rows added since the last
# full matrix run, then the driver checks. Serial — one chip, one core.
#
#   bash scripts/r3_bench_refresh.sh
set -u
cd "$(dirname "$0")/.."

echo "== probe ==" >&2
timeout 120 python -c "import jax; print(jax.devices())" || {
  echo "TPU tunnel down — aborting" >&2; exit 1; }

echo "== missing/new BENCH_EXTRA rows ==" >&2
python scripts/bench_extra.py --out BENCH_EXTRA_r03.json --timeout 3600 \
  --only decode_int8w_int8kv_b8_4k,serve_600m_longctx_int8kv,spec_decode_int8,spec_decode_int8_b8_4k

echo "== driver checks ==" >&2
timeout 900 python __graft_entry__.py
JAX_PLATFORMS=cpu timeout 900 python -c \
  "import __graft_entry__ as g; g.dryrun_multichip(8)" 2>&1 \
  | grep -E "Involuntary|dryrun"

echo "== headline bench (sanity, goes to driver's BENCH_r03) ==" >&2
timeout 2400 python bench.py
