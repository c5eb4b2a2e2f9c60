#!/bin/bash
# Stage-2 instruction tune (full finetune, dual loss) on a TPU pod.
# Replaces scripts/slurm_finetune.sh (32 nodes x 8 GPU, deepspeed ZeRO-3):
# fsdp mesh axis = ZeRO-3 parameter sharding; consumes the stage-1 adapter.
set -euo pipefail

DATA_PATH=${DATA_PATH:?set DATA_PATH}
TOKENIZER=${TOKENIZER:?set TOKENIZER}
LLAMA=${LLAMA:?set LLAMA}
SIGLIP=${SIGLIP:?set SIGLIP}
ADAPTER=${ADAPTER:-./out/stage1/mm_projector.safetensors}
OUT=${OUT:-./out/stage2}

python -m metamorph_tpu.train.main \
  --config configs/stage2_finetune.json \
  --data-path "$DATA_PATH" \
  --tokenizer "$TOKENIZER" \
  --hf-llama-path "$LLAMA" \
  --hf-siglip-path "$SIGLIP" \
  --pretrain-mm-mlp-adapter "$ADAPTER" \
  --output-dir "$OUT" \
  --save-steps 250 \
  --group-by-modality-length \
  --attn-impl flash \
  --multihost
