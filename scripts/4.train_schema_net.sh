#!/bin/sh
# Stage 4: train SchemaNet (reference 4.train_schema_net.sh).
# usage: scripts/4.train_schema_net.sh <dataset> <model> <M> [extra cli args...]
set -e
cd "$(dirname "$0")/.."
DS=${1:-cifar_100}; MODEL=${2:-deit_tiny}; M=${3:-1024}; shift 3 2>/dev/null || true
R=${RUN_DIR:-run}
python -m schemanet_tpu.cli train --worker schema_net_worker \
    --cfg "configs/${DS}/schema_net/${MODEL}-l9-M_${M}.yaml" \
    --log-dir "${R}/${DS}/schema_net/${MODEL}-l9-M_${M}" \
    -o "schema_net.bundle=${R}/${DS}/ingredient/${MODEL}-l9-M_${M}/bundle" \
    -o "schema_net.initial_state_fp=${R}/${DS}/schema_net/init_IR_atlas-${MODEL}-l9-M_${M}.msgpack" "$@"
