#!/bin/sh
# Stage 4: train SchemaNet (reference 4.train_schema_net.sh).
# usage: scripts/4.train_schema_net.sh <dataset> <model> <M> [extra cli args...]
set -e
cd "$(dirname "$0")/.."
DS=${1:-cifar_100}; MODEL=${2:-deit_tiny}; M=${3:-1024}; shift 3 2>/dev/null || true
python -m schemanet_tpu.cli train --worker schema_net_worker \
    --cfg "configs/${DS}/schema_net/${MODEL}-l9-M_${M}.yaml" \
    --log-dir "run/${DS}/schema_net/${MODEL}-l9-M_${M}" "$@"
