#!/bin/bash
# TAE training sweep over the 12 patch x vocab configs.
#
# TPU-native counterpart of the reference SLURM launcher
# (reference scripts/train.sh: sbatch --array=0-11 over the model list,
# identical hyperparameters). Select the config with SWEEP_ID (or pass a
# model name as $1). On a multi-host TPU pod run this same script on every
# host; jax.distributed initializes from the TPU environment automatically.
set -euo pipefail

MODELS=(
  tae_patch16_vocab16_px256  tae_patch16_vocab64_px256  tae_patch16_vocab256_px256
  tae_patch32_vocab64_px256  tae_patch32_vocab256_px256 tae_patch32_vocab1024_px256
  tae_patch64_vocab256_px256 tae_patch64_vocab1024_px256 tae_patch64_vocab4096_px256
  tae_patch128_vocab1024_px256 tae_patch128_vocab4096_px256 tae_patch128_vocab16384_px256
)
MODEL="${1:-${MODELS[${SWEEP_ID:-0}]}}"

TRAIN_DATA="${TRAIN_DATA:?set TRAIN_DATA to the wds shard spec, e.g. /data/imagenet21k-{000000..001023}.tar}"
VAL_DATA="${VAL_DATA:?set VAL_DATA to an ImageFolder val directory}"
OUT="${OUT:-outputs/${MODEL}}"

mkdir -p "${OUT}"
python -m tae_tpu.cli.train \
  --model "${MODEL}" \
  --batch_size_per_gpu 256 \
  --accum_iter 1 \
  --input_size 256 \
  --weight_decay 0.0 \
  --max_lr 0.0001 --min_lr 0.00001 \
  --switch_it 450000 --num_its 750001 \
  --save_freq 50000 \
  --num_workers "${NUM_WORKERS:-16}" \
  --train_data_path "${TRAIN_DATA}" \
  --val_data_path "${VAL_DATA}" \
  --output_dir "${OUT}" \
  --save_prefix "${MODEL}" \
  --display
