#!/bin/sh
# Build the native meshkit library into the python package.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 meshkit.cpp \
    -o ../helmholtz_x_tpu/native/_meshkit.so
echo "built helmholtz_x_tpu/native/_meshkit.so"
