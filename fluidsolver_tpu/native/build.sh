#!/bin/sh
# Build the native host-kernel library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 ib_kernels.cpp -o libfs_native.so
echo "built $(pwd)/libfs_native.so"
