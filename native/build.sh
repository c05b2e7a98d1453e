#!/bin/sh
# Build the native host runtime (C++ -> shared lib for ctypes).
set -e
cd "$(dirname "$0")"
g++ -O3 -std=c++17 -shared -fPIC -o ../leann_tpu/native/libleann_native.so \
    leann_native.cpp
echo "built leann_tpu/native/libleann_native.so"
