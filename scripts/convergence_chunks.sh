#!/bin/bash
# Chunked driver for convergence_run.sh on rigs whose TPU-relay client
# leaks ~1x the host batch bytes per device_put (measured 49 MB/put with
# zero jax.live_arrays() — native retention inside the relay plugin, so a
# 50 MB/iter train loop OOMs a 125 GB host near iteration ~2400).  Each
# chunk is a fresh process ending just past a save point; --resume_auto +
# the persistent compile cache make restarts cost ~2-3 min each.
set -e
for its in "$@"; do
  bash "$(dirname "$0")/convergence_run.sh" "$its" 500
done
echo ALLDONE
