#!/bin/bash
# Build libtaedata.so (native JPEG decode + preprocessing pipeline).
set -euo pipefail
cd "$(dirname "$0")"
# -ffp-contract=off: maskapi.cpp's scan-conversion rounding (ys + s*t + 0.5)
# must double-round exactly like generic (non-FMA) pycocotools wheels and the
# numpy port; FMA contraction could flip boundary-exact crossings by a pixel.
g++ -O3 -march=native -ffp-contract=off -fPIC -shared -std=c++17 \
    taedata.cpp maskapi.cpp -ljpeg -lpthread \
    -o ../tae_tpu/data/libtaedata.so
echo "built tae_tpu/data/libtaedata.so"
