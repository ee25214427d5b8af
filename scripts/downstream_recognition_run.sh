#!/bin/bash
# Downstream recognition convergence-evidence run (docs/CONVERGENCE.md §
# downstream): the in19k driver end-to-end on-chip — frozen
# tae_patch16_vocab16_px256 encoder in the int8 w8a8 serving layout feeding
# a vit_recognition_numpatches256_vocab16_base classifier, reference regime
# (global batch 256 = mb64 x accum 4, lr 1e-4; reference
# recognition/train_recognition_in19k.py:23-47), over the class-conditioned
# structured shards (data/fake.py:make_classification_wds_shard, 20 classes
# whose labels are tied to image colors — chance acc1 = 5%).
#
# The encoder is random-init (no trained TAE checkpoint survives VM resets
# on this rig): the fixture ties labels to color statistics, which any
# fixed patch-linear encoder preserves, so classifier learning measures the
# downstream trainer, not encoder quality. The bf16-encoder variant of this
# step exceeds the relay compile-helper payload (HTTP 413) on this rig —
# int8 is also the deployment-realistic frozen-encoder mode.
#
# Data fixture:
#   cd /root/repo && python - <<'PY'
#   from tae_tpu.data.fake import make_classification_wds_shard
#   for i in range(8):
#       make_classification_wds_shard(
#           f"/root/repo/.convergence/cls/train-{i:06d}.tar",
#           num_samples=1000, size=288, num_classes=20, seed=i)
#   PY
# Usage: downstream_recognition_run.sh [num_its] [save_freq]
set -x
cd /root/repo
export TAE_TPU_COMPILE_CACHE=/root/repo/.xla_cache
exec python -m tae_tpu.cli.train_recognition_in19k \
  --model vit_recognition_numpatches256_vocab16_base \
  --encoder tae_patch16_vocab16_px256 \
  --encoder_quantization int8 \
  --num_classes 20 \
  --train_data_path '/root/repo/.convergence/cls/train-{000000..000007}.tar' \
  --output_dir /root/repo/.convergence/out_rec \
  --save_prefix dconv \
  --batch_size 64 --accum_iter 4 \
  --max_lr 1e-4 --min_lr 1e-5 \
  --num_its "${1:-1201}" --save_freq "${2:-300}" --log_freq 25 \
  --num_workers 1 --device_normalize --remat
