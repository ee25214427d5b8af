#!/bin/bash
# Vocab-width convergence sweep, take 2 (r3 session 9), on the SPECTRAL
# corpus. The first sweep on the structured corpus showed vocab16 and
# vocab64 tracking the same eval curve (0.0112 vs 0.0108 at iter 1500) —
# that corpus is too compressible for the bottleneck to bind
# (scripts/spectral_floor_probe.py quantifies it). The 1/f^alpha spectral
# corpus (tae_tpu/data/fake.py:_spectral_image) has per-patch linear
# coding floors that separate strongly by width, so the reference's
# published eval-MSE-vs-vocab ordering (SURVEY.md §6: vocab16 0.04702 >
# vocab64 0.01717 > vocab256 0.00205 at 750k on ImageNet) can emerge at
# short horizons.
#
# Data fixture (generate once; ~5 min on one core):
#   cd /root/repo && python - <<'PY'
#   from tae_tpu.data.fake import *
#   for i in range(24):
#       make_spectral_wds_shard(
#           f"/root/repo/.convergence/data_spectral/train-{i:06d}.tar",
#           num_samples=1000, size=288, seed=i)
#   make_spectral_imagefolder("/root/repo/.convergence/data_spectral/val",
#                             num_images=512, size=288, seed=10_000)
#   PY
#
# Usage: convergence_spectral_sweep.sh [num_its] [save_freq] [vocabs...]
#   default: 1001 250 16 64 256   (runs sequentially on the one chip)
set -x
cd /root/repo
export TAE_TPU_COMPILE_CACHE=/root/repo/.xla_cache
NUM_ITS="${1:-1001}"
SAVE_FREQ="${2:-250}"
shift 2 2>/dev/null || true
VOCABS=("${@:-16 64 256}")
[ ${#VOCABS[@]} -eq 1 ] && VOCABS=(${VOCABS[0]})
for V in "${VOCABS[@]}"; do
  python -m tae_tpu.cli.train \
    --model "tae_patch16_vocab${V}_px256" \
    --train_data_path '/root/repo/.convergence/data_spectral/train-{000000..000023}.tar' \
    --val_data_path /root/repo/.convergence/data_spectral/val \
    --output_dir "/root/repo/.convergence/out_spec_vocab${V}" \
    --save_prefix conv \
    --batch_size_per_gpu 64 --accum_iter 4 \
    --max_lr 1e-4 --min_lr 1e-5 --weight_decay 0.0 \
    --num_its "$NUM_ITS" --save_freq "$SAVE_FREQ" --log_freq 50 \
    --num_workers 1 --device_normalize --remat --display \
    --resume_auto
  echo "SWEEP: vocab${V} exited with $?"
  # Untracked files do not survive rig swaps (r3 session 10 lost a full
  # run this way) — persist the JSONL log into git as soon as each vocab
  # finishes so the evidence is durable even if the sweep is cut short.
  LOG="/root/repo/.convergence/out_spec_vocab${V}/conv_log.txt"
  if [ -f "$LOG" ]; then
    cp "$LOG" "/root/repo/docs/logs/spectral_vocab${V}_log.txt"
    # Pathspec-scoped add AND commit: a concurrent session's staged files
    # must not get swept into this background commit under a misleading
    # message (ADVICE r3 item 1 / VERDICT r4 item 5).
    git -C /root/repo add -- "docs/logs/spectral_vocab${V}_log.txt" || true
    git -C /root/repo commit -m "Spectral sweep: vocab${V} training log" \
      -- "docs/logs/spectral_vocab${V}_log.txt" || true
  fi
done
echo "SWEEP: DONE"
