#!/bin/bash
# Single-chip smoke run (replaces scripts/debug_*_1node.sh).
set -euo pipefail
DATA_PATH=${DATA_PATH:?set DATA_PATH}
TOKENIZER=${TOKENIZER:?set TOKENIZER}

python -m metamorph_tpu.train.main \
  --config configs/debug_1chip.json \
  --data-path "$DATA_PATH" \
  --tokenizer "$TOKENIZER" \
  --output-dir ./out/debug \
  --save-steps 25 \
  --attn-impl flash
