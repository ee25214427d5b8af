#!/bin/bash
# Chunked driver for convergence_run.sh on rigs whose TPU-relay client
# leaks ~1x the host batch bytes per device_put (measured 49 MB/put with
# zero jax.live_arrays() — native retention inside the relay plugin, so a
# 50 MB/iter uint8 train loop OOMs a 125 GB host near iteration ~2400;
# the f32 fallback path leaks 4x that and dies near 600 — build
# native/build.sh first).  Each chunk is a fresh process ending just past
# a save point; --resume_auto + the persistent compile cache make
# restarts cost ~2-3 min each.  A chunk that gets OOM-killed mid-way is
# retried (resume_auto continues from the last saved checkpoint), up to
# 3 attempts per chunk, so one kill doesn't end the whole run.
for its in "$@"; do
  ok=0
  for attempt in 1 2 3; do
    if bash "$(dirname "$0")/convergence_run.sh" "$its" 500; then
      ok=1
      break
    fi
    echo "chunk $its attempt $attempt failed; retrying from last checkpoint" >&2
    sleep 5
  done
  if [ "$ok" != 1 ]; then
    echo "chunk $its failed 3 times; aborting" >&2
    exit 1
  fi
done
echo ALLDONE
