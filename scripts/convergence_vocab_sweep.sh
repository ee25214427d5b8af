#!/bin/bash
# SUPERSEDED for width-ordering claims by convergence_spectral_sweep.sh:
# on this structured corpus the bottleneck never binds (16 PCA components
# already reach floor 0.0067/elem — scripts/spectral_floor_probe.py), so
# vocab16/64 track the same eval curve (docs/CONVERGENCE.md attempt 1).
#
# Vocab-width convergence sweep (r3 session 9): train the other two
# p16 configs — tae_patch16_vocab{64,256}_px256 — on the SAME structured
# synthetic corpus (identical fixture seeds) and regime as the r3
# vocab16 run (scripts/convergence_run.sh, 5000 iters), to reproduce the
# reference's central published ordering: eval MSE falls monotonically
# as the bottleneck widens (reference outputs/, SURVEY.md §6 —
# vocab16 0.04702 > vocab64 0.01717 > vocab256 0.00205 at 750k iters).
# Only the bottleneck projections change across configs (dict_proj /
# decoder_embed, tae.py:160,165-equivalent), so iteration cost is flat.
#
# Usage: convergence_vocab_sweep.sh <vocab> [num_its] [save_freq]
#   e.g. convergence_vocab_sweep.sh 64 1501 250
set -x
cd /root/repo
VOCAB="${1:?vocab width (64 or 256)}"
# NOTE: do NOT overwrite PYTHONPATH — the axon sitecustomize lives there.
export TAE_TPU_COMPILE_CACHE=/root/repo/.xla_cache
exec python -m tae_tpu.cli.train \
  --model "tae_patch16_vocab${VOCAB}_px256" \
  --train_data_path '/root/repo/.convergence/data/train-{000000..000023}.tar' \
  --val_data_path /root/repo/.convergence/data/val \
  --output_dir "/root/repo/.convergence/out_vocab${VOCAB}" \
  --save_prefix conv \
  --batch_size_per_gpu 64 --accum_iter 4 \
  --max_lr 1e-4 --min_lr 1e-5 --weight_decay 0.0 \
  --num_its "${2:-1501}" --save_freq "${3:-250}" --log_freq 50 \
  --num_workers 1 --device_normalize --remat \
  --resume_auto
