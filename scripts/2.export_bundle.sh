#!/bin/sh
# Stage 2: export the frozen bundle (reference 2.save_backbone_jit.sh).
# usage: scripts/2.export_bundle.sh <dataset> <model> <M> <num_classes> [max_features]
set -e
cd "$(dirname "$0")/.."
DS=${1:-cifar_100}; MODEL=${2:-deit_tiny}; M=${3:-1024}; K=${4:-100}; MAXF=${5:-1000000}
R=${RUN_DIR:-run}
python -m schemanet_tpu.cli export \
    --cfg "configs/${DS}/ingredient/${MODEL}-l9-M_${M}.yaml" \
    --ckpt "${R}/${DS}/vanilla/${MODEL}/ckpt/best" \
    --vocabulary-fp "${R}/${DS}/ingredient/${MODEL}-l9-M_${M}/cluster_${M}_from_${MAXF}.npy" \
    --save-path "${R}/${DS}/ingredient/${MODEL}-l9-M_${M}/bundle" \
    --num-classes "${K}"
