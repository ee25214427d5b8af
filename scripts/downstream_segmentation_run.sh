#!/bin/bash
# Downstream segmentation convergence-evidence run (docs/CONVERGENCE.md §
# downstream): the segmentation driver end-to-end on-chip — frozen
# tae_patch16_vocab16_px256 encoder (int8 w8a8 serving layout) under a
# vit_segmentation_numpatches256_vocab16_base dense head, reference regime
# (batch 8, lr 0.01, wd 1e-4, out + 0.5*aux CE; reference
# segmentation/train.py:24-47,49-57), on the color-coded structured COCO
# fixture (data/fake.py:make_structured_coco — ellipse fill color is a
# deterministic function of the VOC class, so mask supervision is
# learnable; random-prediction mIoU over 21 classes is ~0-5%).
#
# Data fixture:
#   cd /root/repo && python - <<'PY'
#   from tae_tpu.data.fake import make_structured_coco
#   make_structured_coco("/root/repo/.convergence/coco", n_train=400,
#                        n_val=64, size=288, seed=0)
#   PY
# Usage: downstream_segmentation_run.sh [epochs] [model_ckpt] [lr] [outdir]
#   model_ckpt (optional): a recognition-trainer checkpoint dir to
#   initialize the trunk from (the reference workflow — their seg driver
#   loads an in1k-pretrained recognition checkpoint and swaps heads,
#   segmentation/train.py:150-157). Pass the downstream_recognition_run
#   output, e.g. .convergence/out_rec/dconv_*_checkpoint (20 classes).
#   lr (optional, default 0.01 = the reference default): the CPU probe
#   (scripts/seg_probe.py, docs/CONVERGENCE.md) isolated the mIoU plateau
#   to AdamW lr 0.01 at depth-12 scale — pass 1e-3 for evidence runs.
set -x
cd /root/repo
export TAE_TPU_COMPILE_CACHE=/root/repo/.xla_cache
CKPT_ARGS=()
if [ -n "${2:-}" ]; then
  CKPT_ARGS=(--model_ckpt "$2" --pretrain_num_classes 20)
fi
exec python -m tae_tpu.cli.train_segmentation \
  --dataset coco --data_path /root/repo/.convergence/coco \
  --model vit_segmentation_numpatches256_vocab16_base \
  --encoder tae_patch16_vocab16_px256 \
  --encoder_quantization int8 \
  --batch_size_per_gpu 8 --epochs "${1:-12}" \
  --lr "${3:-0.01}" \
  --workers 1 --print_freq 10 \
  "${CKPT_ARGS[@]}" \
  --output_dir "${4:-/root/repo/.convergence/out_seg}"
