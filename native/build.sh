#!/bin/sh
# Build the native host-side image pipeline (libimagepipe.so).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -ffast-math -fPIC -shared -std=c++17 \
    src/imagepipe.cpp -ljpeg -o libimagepipe.so
echo "built $(pwd)/libimagepipe.so"
