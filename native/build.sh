#!/bin/sh
# Build the native data-path library. Output lands next to the sources so
# mra_gan_tpu/data/native.py can find it.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -shared -fPIC nifti_io.cc -o libmra_native.so -lz -lpthread
echo "built $(pwd)/libmra_native.so"
