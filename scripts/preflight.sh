#!/usr/bin/env bash
# Commit gate (round-4 postmortem, VERDICT r4 item 7): run the FULL test
# suite and the headline bench BEFORE any round-snapshot commit, and leave
# both summaries in a file the commit body can quote. A snapshot that skips
# this is how round 4 shipped a broken training backward.
#
#   bash scripts/preflight.sh [out.txt]     # default /tmp/preflight.txt
#
# Exit code is non-zero if either the suite or the bench fails, so it can
# gate scripts:  bash scripts/preflight.sh && git commit ...
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/preflight.txt}"
rc=0

echo "[preflight] full suite (CPU, ~45 min) ..." >&2
SUITE_LOG=$(mktemp)
if ! timeout 4800 python -m pytest tests/ -q >"$SUITE_LOG" 2>&1; then
  rc=1
fi
SUITE_SUMMARY=$(grep -E "(passed|failed|error)" "$SUITE_LOG" | tail -1)

echo "[preflight] headline bench (TPU) ..." >&2
BENCH_LOG=$(mktemp)
if timeout 1800 python bench.py >"$BENCH_LOG" 2>/dev/null; then
  BENCH_LINE=$(tail -1 "$BENCH_LOG")
else
  BENCH_LINE="BENCH FAILED (rc=$?)"
  rc=1
fi

{
  echo "preflight @ $(git rev-parse --short HEAD) $(date -u +%FT%TZ)"
  echo "suite: ${SUITE_SUMMARY:-NO SUMMARY (crash?)}"
  echo "bench: $BENCH_LINE"
} | tee "$OUT"
rm -f "$SUITE_LOG" "$BENCH_LOG"
exit $rc
