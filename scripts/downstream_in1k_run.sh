#!/bin/bash
# Downstream in1k fine-tune convergence-evidence run (docs/CONVERGENCE.md §
# downstream): the epoch-based fine-tune driver end-to-end on-chip —
# head-swap transfer from an in19k recognition checkpoint (reference
# recognition/train_recognition_in1k.py:103-128), frozen int8 encoder,
# RandomResizedCrop(bilinear) + RandAugment + MixUp/CutMix collate,
# label-smoothed CE, StepLR(90, 0.1), per-epoch acc1/acc5 eval with
# best-acc1 checkpointing.
#
# Data fixture (same class anchors as the in19k wds fixture, so the
# transferred trunk is on-distribution):
#   cd /root/repo && python - <<'PY'
#   from tae_tpu.data.fake import make_classification_imagefolder
#   make_classification_imagefolder("/root/repo/.convergence/cls_folder/train",
#                                   num_images=600, num_classes=20, seed=0)
#   make_classification_imagefolder("/root/repo/.convergence/cls_folder/val",
#                                   num_images=200, num_classes=20, seed=777)
#   PY
# Usage: downstream_in1k_run.sh [epochs] [model_ckpt]
set -x
cd /root/repo
export TAE_TPU_COMPILE_CACHE=/root/repo/.xla_cache
CKPT_ARGS=()
if [ -n "${2:-}" ]; then
  CKPT_ARGS=(--model_ckpt "$2" --pretrain_num_classes 20)
fi
exec python -m tae_tpu.cli.train_recognition_in1k \
  --model vit_recognition_numpatches256_vocab16_base \
  --encoder tae_patch16_vocab16_px256 \
  --encoder_quantization int8 \
  --num_classes 20 \
  --train_data_path /root/repo/.convergence/cls_folder/train \
  --val_data_path /root/repo/.convergence/cls_folder/val \
  --batch_size 64 --epochs "${1:-12}" \
  --num_workers 1 --log_freq 5 --remat \
  "${CKPT_ARGS[@]}" \
  --save_prefix din1k \
  --output_dir /root/repo/.convergence/out_in1k
