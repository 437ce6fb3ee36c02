#!/bin/sh
# Build the native host runtime (optional; raw_ngp_tpu.native builds it on
# demand with the same flags and falls back to numpy without it).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -fopenmp \
    raw_ngp_native.cpp -o raw_ngp_native.so \
  || g++ -O3 -march=native -shared -fPIC \
    raw_ngp_native.cpp -o raw_ngp_native.so
echo "built raw_ngp_native.so"
