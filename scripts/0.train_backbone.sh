#!/bin/sh
# Stage 0b: fine-tune the backbone (reference 0.train_bakcbone.sh [sic]).
# usage: scripts/0.train_backbone.sh <dataset> [model] [extra cli args...]
set -e
cd "$(dirname "$0")/.."
DS=${1:-cifar_100}; MODEL=${2:-deit_tiny}; shift 2 2>/dev/null || true
R=${RUN_DIR:-run}
python -m schemanet_tpu.cli train --worker backbone_worker \
    --cfg "configs/${DS}/vanilla/${MODEL}.yaml" \
    --log-dir "${R}/${DS}/vanilla/${MODEL}" "$@"
