#!/bin/bash
# Build libtaedata.so (native JPEG decode + preprocessing pipeline).
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    taedata.cpp maskapi.cpp -ljpeg -lpthread \
    -o ../tae_tpu/data/libtaedata.so
echo "built tae_tpu/data/libtaedata.so"
