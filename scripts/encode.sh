#!/bin/bash
# Dataset tokenization (counterpart of reference scripts/encode.sh — but
# streaming sharded output instead of a single multi-hundred-GB .pth).
set -euo pipefail
MODEL="${1:?usage: encode.sh <model> <checkpoint>}"
CKPT="${2:?usage: encode.sh <model> <checkpoint>}"
DATA="${DATA:?set DATA to the wds shard spec to encode}"

# Fast path (needs native/build.sh): uint8 H2D + pre-patchified layout.
# Add QUANT=int8 for the w8a8 serving mode (+34-63% measured; latent rel
# err ~3e-2 vs bf16 — fine for downstream training, judge for eval).
python -m tae_tpu.cli.encode \
  --model "${MODEL}" \
  --model_ckpt "${CKPT}" \
  --batch_size 2048 \
  --num_iters "${NUM_ITERS:-7500}" \
  --input_size 256 \
  --num_workers "${NUM_WORKERS:-16}" \
  --device_normalize --patch_layout \
  ${QUANT:+--quantization "${QUANT}"} \
  --data_path "${DATA}" \
  --output_dir "${OUT:-outputs/encoded_${MODEL}}" \
  --save_prefix encoded
