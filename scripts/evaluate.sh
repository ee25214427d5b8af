#!/bin/bash
# Reconstruction evaluation (counterpart of reference scripts/evaluate.sh).
set -euo pipefail
MODEL="${1:?usage: evaluate.sh <model> <checkpoint>}"
CKPT="${2:?usage: evaluate.sh <model> <checkpoint>}"
VAL_DATA="${VAL_DATA:?set VAL_DATA to an ImageFolder val directory}"

python -m tae_tpu.cli.evaluate \
  --model "${MODEL}" \
  --resume "${CKPT}" \
  --batch_size_per_gpu 1024 \
  --input_size 256 \
  --val_data_path "${VAL_DATA}" \
  --output_dir "${OUT:-outputs/eval_${MODEL}}" \
  --save_prefix "${MODEL}" \
  --display
