#!/bin/bash
# Stage-1 connector pretrain on a TPU pod slice.
# Replaces scripts/slurm_pretrain.sh (SLURM + torchrun + deepspeed ZeRO-2):
# run this ONCE PER HOST (e.g. `gcloud compute tpus tpu-vm ssh ... --worker=all`);
# jax.distributed.initialize() handles rendezvous (no c10d / NCCL).
set -euo pipefail

DATA_PATH=${DATA_PATH:?set DATA_PATH to the training jsonl}
TOKENIZER=${TOKENIZER:?set TOKENIZER to the LLaMA-3 tokenizer dir}
LLAMA=${LLAMA:?set LLAMA to the HF LLaMA-3.1-8B weights dir}
SIGLIP=${SIGLIP:?set SIGLIP to the HF siglip-so400m-patch14-384 weights dir}
OUT=${OUT:-./out/stage1}

python -m metamorph_tpu.train.main \
  --config configs/stage1_pretrain.json \
  --data-path "$DATA_PATH" \
  --tokenizer "$TOKENIZER" \
  --hf-llama-path "$LLAMA" \
  --hf-siglip-path "$SIGLIP" \
  --output-dir "$OUT" \
  --save-steps 500 \
  --attn-impl flash \
  --multihost
