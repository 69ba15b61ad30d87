#!/bin/sh
# Build the native host runtime (libtpu_pathopt_runtime.so).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -o libtpu_pathopt_runtime.so esdf.cpp
echo "built $(pwd)/libtpu_pathopt_runtime.so"
