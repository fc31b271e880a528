#!/usr/bin/env bash
# Build the native frame-ops library for the data pipeline.
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p stif_tpu/data/_native
g++ -O3 -fPIC -shared -fopenmp -std=c++17 \
    native/frame_ops.cpp \
    -o stif_tpu/data/_native/libframe_ops.so
echo "built stif_tpu/data/_native/libframe_ops.so"
