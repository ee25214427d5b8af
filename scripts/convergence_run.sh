#!/bin/bash
# Round-3 convergence-evidence run (VERDICT r2 item 3): the real
# tae_patch16_vocab16_px256 config (380M params), reference regime
# (global batch 256 = mb64 x accum 4, lr 1e-4, wd 0, bf16 compute,
# fp32 Adam), over structured synthetic wds shards (data/fake.py) —
# this rig has no ImageNet access. uint8 H2D + on-device normalize
# keeps the tunneled host->device link off the critical path.
#
# Data/output/compile-cache live under the repo (gitignored) because on
# this rig only /root/repo survives VM resets; with --resume_auto +
# TAE_TPU_COMPILE_CACHE a reset costs one client init, not a 20-min
# recompile + lost iterations.  Data fixture:
#   cd /root/repo && python - <<'PY'
#   from tae_tpu.data.fake import *
#   for i in range(24):
#       make_structured_wds_shard(f"/root/repo/.convergence/data/train-{i:06d}.tar",
#                                 num_samples=1000, size=288, seed=i)
#   make_structured_imagefolder("/root/repo/.convergence/data/val",
#                               num_images=512, size=288, seed=10_000)
#   PY
# Usage: convergence_run.sh [num_its] [save_freq]   (chunk by calling again with a
# larger num_its; --resume_auto continues from the last best checkpoint)
set -x
cd /root/repo
# NOTE: do NOT overwrite PYTHONPATH here — the default env points it at
# /root/.axon_site, whose sitecustomize registers the axon TPU backend;
# replacing it silently drops the chip. `python -m` from the repo cwd
# already puts the package on sys.path.
export TAE_TPU_COMPILE_CACHE=/root/repo/.xla_cache
exec python -m tae_tpu.cli.train \
  --model tae_patch16_vocab16_px256 \
  --train_data_path '/root/repo/.convergence/data/train-{000000..000023}.tar' \
  --val_data_path /root/repo/.convergence/data/val \
  --output_dir /root/repo/.convergence/out \
  --save_prefix conv \
  --batch_size_per_gpu 64 --accum_iter 4 \
  --max_lr 1e-4 --min_lr 1e-5 --weight_decay 0.0 \
  --num_its "${1:-5001}" --save_freq "${2:-500}" --log_freq 50 \
  --num_workers 1 --device_normalize --remat --display \
  --resume_auto
