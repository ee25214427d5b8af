#!/bin/bash
# COCO->VOC segmentation training (counterpart of reference
# segmentation/train.sh).
set -euo pipefail
MODEL="${1:?usage: train_segmentation.sh <model> <encoder>}"
ENCODER="${2:?usage: train_segmentation.sh <model> <encoder>}"

DATA="${DATA:?COCO root (train2017/ val2017/ annotations/)}"
ENCODER_CKPT="${ENCODER_CKPT:?trained TAE checkpoint}"
OUT="${OUT:-outputs_segmentation/${MODEL}}"

mkdir -p "${OUT}"
python -m tae_tpu.cli.train_segmentation \
  --dataset coco \
  --data_path "${DATA}" \
  --model "${MODEL}" \
  --encoder "${ENCODER}" \
  --encoder_ckpt "${ENCODER_CKPT}" \
  ${ENCODER_QUANT:+--encoder_quantization "${ENCODER_QUANT}"} \
  --batch_size_per_gpu 8 \
  --epochs 30 \
  --lr 0.01 \
  --weight_decay 0.0001 \
  --workers "${NUM_WORKERS:-16}" \
  --output_dir "${OUT}"
