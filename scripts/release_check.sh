#!/usr/bin/env bash
# One-command evidence bundle: every bench mode + multichip dryrun + offline
# parity certification, emitted as a single JSON object (stdout) and saved to
# RELEASE_CHECK.json. Run on a machine with the TPU chip attached; set
# RELEASE_FAST=1 to skip the slow parity phases.
#
#   bash scripts/release_check.sh [out.json]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-RELEASE_CHECK.json}"
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT

run_mode() { # name, env...
  local name="$1"; shift
  echo "[release_check] $name ..." >&2
  if env "$@" timeout 2400 python bench.py >"$TMP/$name.json" 2>"$TMP/$name.log"; then
    tail -1 "$TMP/$name.json"
  else
    echo "{\"error\": \"$name failed\", \"log_tail\": \"$(tail -3 "$TMP/$name.log" | tr '"' "'" | tr '\n' ';')\"}"
  fi
}

{
  echo '{'
  echo "\"train\": $(run_mode train BENCH_STEPS=10),"
  echo "\"train_8b_slice\": $(run_mode slice BENCH_MODE=8b_slice),"
  echo "\"decode_b1\": $(run_mode decode BENCH_MODE=decode),"
  echo "\"decode_b1_int8\": $(run_mode decode_i8 BENCH_MODE=decode BENCH_DECODE_QUANT=1),"
  echo "\"serve\": $(run_mode serve BENCH_MODE=serve),"
  echo "\"serve_int8\": $(run_mode serve_i8 BENCH_MODE=serve BENCH_SERVE_QUANT=1),"
  echo "\"spec_decode_int8\": $(run_mode spec_i8 BENCH_MODE=spec_decode BENCH_DECODE_QUANT=1),"
  echo "\"encode\": $(run_mode encode BENCH_MODE=encode),"
  echo "\"render\": $(run_mode render BENCH_MODE=render),"

  echo -n '"multichip_dryrun": '
  if JAX_PLATFORMS=cpu timeout 900 python -c \
      "import __graft_entry__ as g; g.dryrun_multichip(8)" >"$TMP/dry.log" 2>&1 \
      && ! grep -q "Involuntary full rematerialization" "$TMP/dry.log"; then
    echo '{"ok": true},'
  else
    echo "{\"ok\": false, \"log_tail\": \"$(tail -2 "$TMP/dry.log" | tr '"' "'" | tr '\n' ';')\"},"
  fi

  if [ "${RELEASE_FAST:-0}" != "1" ]; then
    # PARITY_OUT: persistent artifact path (e.g. PARITY_r05.json) — the
    # runner checkpoints per phase, so pointing successive invocations at
    # the same file resumes instead of re-running completed phases.
    PARITY_OUT="${PARITY_OUT:-$TMP/parity.json}"
    echo -n '"parity": '
    if timeout 14400 python scripts/run_parity.py --out "$PARITY_OUT" \
        >"$TMP/parity.log" 2>&1; then
      cat "$PARITY_OUT"; echo ','
    else
      echo "{\"error\": \"parity failed\", \"log_tail\": \"$(tail -3 "$TMP/parity.log" | tr '"' "'" | tr '\n' ';')\"},"
    fi
  fi

  echo "\"git\": \"$(git rev-parse --short HEAD 2>/dev/null || echo unknown)\","
  echo "\"date\": \"$(date -u +%FT%TZ)\""
  echo '}'
} | tee "$OUT"
