#!/bin/sh
# Stage 0a: build native components (reference 0.build.sh builds cpp_extension;
# here the TPU compute path needs no native build — this compiles the host-side
# image pipeline, and Pallas kernels JIT at first use).
set -e
cd "$(dirname "$0")/.."
./native/build.sh
