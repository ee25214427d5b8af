#!/bin/bash
# ImageNet-1k fine-tune from an in19k checkpoint (counterpart of reference
# recognition/train_recognition_in1k.sh).
set -euo pipefail
MODEL="${1:?usage: train_recognition_in1k.sh <model> <encoder>}"
ENCODER="${2:?usage: train_recognition_in1k.sh <model> <encoder>}"

TRAIN_DATA="${TRAIN_DATA:?ImageFolder train dir}"
VAL_DATA="${VAL_DATA:?ImageFolder val dir}"
ENCODER_CKPT="${ENCODER_CKPT:?trained TAE checkpoint}"
MODEL_CKPT="${MODEL_CKPT:?in19k-pretrained classifier checkpoint}"
OUT="${OUT:-outputs_recognition/in1k/${MODEL}}"

mkdir -p "${OUT}"
python -m tae_tpu.cli.train_recognition_in1k \
  --model "${MODEL}" \
  --model_ckpt "${MODEL_CKPT}" \
  --encoder "${ENCODER}" \
  --encoder_ckpt "${ENCODER_CKPT}" \
  ${ENCODER_QUANT:+--encoder_quantization "${ENCODER_QUANT}"} \
  --num_classes 1000 \
  --epochs 100 \
  --batch_size 256 \
  --lr 0.001 \
  --input_size 256 \
  --num_workers "${NUM_WORKERS:-16}" \
  --train_data_path "${TRAIN_DATA}" \
  --val_data_path "${VAL_DATA}" \
  --output_dir "${OUT}" \
  --save_prefix in1k
