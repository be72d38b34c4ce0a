#!/bin/sh
# Stage 3: initialise the IR-Atlas (reference 3.init_schema_net.sh).
# usage: scripts/3.init_schema_net.sh <dataset> <model> <M> [make_partial]
set -e
cd "$(dirname "$0")/.."
DS=${1:-cifar_100}; MODEL=${2:-deit_tiny}; M=${3:-1024}; PARTIAL=${4:-}
R=${RUN_DIR:-run}
EXTRA=""
[ -n "$PARTIAL" ] && EXTRA="--make-partial $PARTIAL"
python -m schemanet_tpu.cli init \
    --cfg "configs/${DS}/schema_net/${MODEL}-l9-M_${M}.yaml" \
    --save-fp "${R}/${DS}/schema_net/init_IR_atlas-${MODEL}-l9-M_${M}.msgpack" \
    -o "schema_net.bundle=${R}/${DS}/ingredient/${MODEL}-l9-M_${M}/bundle" \
    $EXTRA
