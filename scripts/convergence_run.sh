#!/bin/bash
# Round-3 convergence-evidence run (VERDICT r2 item 3): the real
# tae_patch16_vocab16_px256 config (380M params), reference regime
# (global batch 256 = mb64 x accum 4, lr 1e-4, wd 0, bf16 compute,
# fp32 Adam), over structured synthetic wds shards (data/fake.py) —
# this rig has no ImageNet access. uint8 H2D + on-device normalize
# keeps the tunneled host->device link off the critical path.
set -x
cd /root/repo
exec python -m tae_tpu.cli.train \
  --model tae_patch16_vocab16_px256 \
  --train_data_path '/root/convergence_data/train-{000000..000023}.tar' \
  --val_data_path /root/convergence_data/val \
  --output_dir /root/convergence_out \
  --save_prefix conv \
  --batch_size_per_gpu 64 --accum_iter 4 \
  --max_lr 1e-4 --min_lr 1e-5 --weight_decay 0.0 \
  --num_its "${1:-5001}" --save_freq 500 --log_freq 50 \
  --num_workers 1 --device_normalize --remat --display \
  --resume_auto
