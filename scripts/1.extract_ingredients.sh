#!/bin/sh
# Stage 1: extract the ingredient codebook (reference 1.extract_ingredients.sh).
# usage: scripts/1.extract_ingredients.sh <dataset> <model> <M> [max_features]
set -e
cd "$(dirname "$0")/.."
DS=${1:-cifar_100}; MODEL=${2:-deit_tiny}; M=${3:-1024}; MAXF=${4:-1000000}
R=${RUN_DIR:-run}
python -m schemanet_tpu.cli extract \
    --cfg "configs/${DS}/ingredient/${MODEL}-l9-M_${M}.yaml" \
    --ckpt "${R}/${DS}/vanilla/${MODEL}/ckpt/best" \
    --save-path "${R}/${DS}/ingredient/${MODEL}-l9-M_${M}" \
    --max-features "${MAXF}"
