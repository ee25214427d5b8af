#!/bin/bash
# Latent-classifier pretraining sweep (counterpart of reference
# recognition/train_recognition_in19k.sh: --array=0-11 over encoder/model
# pairs, batch 896, lr 1e-4 -> 1e-5 at 500k, 600k iters).
set -euo pipefail

ENCODERS=(
  tae_patch16_vocab16_px256  tae_patch16_vocab64_px256  tae_patch16_vocab256_px256
  tae_patch32_vocab64_px256  tae_patch32_vocab256_px256 tae_patch32_vocab1024_px256
  tae_patch64_vocab256_px256 tae_patch64_vocab1024_px256 tae_patch64_vocab4096_px256
  tae_patch128_vocab1024_px256 tae_patch128_vocab4096_px256 tae_patch128_vocab16384_px256
)
MODELS=(
  vit_recognition_numpatches256_vocab16_base vit_recognition_numpatches256_vocab64_base
  vit_recognition_numpatches256_vocab256_base vit_recognition_numpatches64_vocab64_base
  vit_recognition_numpatches64_vocab256_base vit_recognition_numpatches64_vocab1024_base
  vit_recognition_numpatches16_vocab256_base vit_recognition_numpatches16_vocab1024_base
  vit_recognition_numpatches16_vocab4096_base vit_recognition_numpatches4_vocab1024_base
  vit_recognition_numpatches4_vocab4096_base vit_recognition_numpatches4_vocab16384_base
)
ID="${SWEEP_ID:-0}"
ENCODER="${ENCODERS[$ID]}"
MODEL="${MODELS[$ID]}"

TRAIN_DATA="${TRAIN_DATA:?set TRAIN_DATA to the in19k wds shard spec}"
ENCODER_CKPT="${ENCODER_CKPT:?set ENCODER_CKPT to the trained TAE checkpoint}"
OUT="${OUT:-outputs_recognition/in19k/${MODEL}}"

mkdir -p "${OUT}"
python -m tae_tpu.cli.train_recognition_in19k \
  --model "${MODEL}" \
  --encoder "${ENCODER}" \
  --encoder_ckpt "${ENCODER_CKPT}" \
  ${ENCODER_QUANT:+--encoder_quantization "${ENCODER_QUANT}"} \
  --num_classes 19167 \
  --batch_size 896 \
  --input_size 256 \
  --weight_decay 0.0 \
  --max_lr 0.0001 --min_lr 0.00001 \
  --switch_it 500000 --num_its 600001 \
  --save_freq 50000 \
  --num_workers "${NUM_WORKERS:-16}" \
  --train_data_path "${TRAIN_DATA}" \
  --output_dir "${OUT}" \
  --save_prefix in19k
