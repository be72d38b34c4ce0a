#!/bin/sh
# Day-one real-data parity kit: run one BASELINE.md config end-to-end
# (port -> backbone fine-tune -> extract -> export -> init -> schema train ->
# eval), asserting the expected artifact after every stage. See PARITY.md for
# the per-config matrix, weight filenames, and acceptance criteria.
#
# usage:  sh tools/parity_run.sh <1|2|3|4|5|dry>  [extra cli args...]
#   1  cifar_10      deit_tiny   M=128
#   2  cifar_100     deit_tiny   M=1024
#   3  caltech_101   deit_small  M=1024
#   4  mini_imagenet deit_small  M=1024
#   5  imagenet      deit_base   M=8000    (multi-chip: --mesh-data N)
#   dry  synthetic stand-in, tiny shapes — validates the kit itself with no
#        data/weights on disk (runs today under zero egress)
#
# env:  WEIGHTS_DIR  (default weights/)  — renamed-DeiT ckpts, see PARITY.md
#       RUN_DIR      (default run/)      — artifact root
#       MESH_DATA    (optional)          — data-parallel axis for stages 0/4
set -e
cd "$(dirname "$0")/.."
RUN_DIR=${RUN_DIR:-run}
WEIGHTS_DIR=${WEIGHTS_DIR:-weights}
export RUN_DIR  # stage scripts root their artifact paths here too

case "$1" in
  1) DS=cifar_10;      MODEL=deit_tiny;  M=128;  K=10;   MAXF=1000000 ;;
  2) DS=cifar_100;     MODEL=deit_tiny;  M=1024; K=100;  MAXF=1000000 ;;
  3) DS=caltech_101;   MODEL=deit_small; M=1024; K=101;  MAXF=1000000 ;;
  4) DS=mini_imagenet; MODEL=deit_small; M=1024; K=100;  MAXF=1000000 ;;
  5) DS=imagenet;      MODEL=deit_base;  M=8000; K=1000; MAXF=50000000 ;;
  dry) DS=synthetic;   MODEL=deit_tiny;  M=128;  K=10;   MAXF=2048 ;;
  *) echo "usage: sh tools/parity_run.sh <1|2|3|4|5|dry> [extra cli args...]"; exit 2 ;;
esac
shift
MESH=${MESH_DATA:+--mesh-data $MESH_DATA}

say()  { echo; echo "=== parity[$DS/$MODEL/M=$M] $* ==="; }
need() { [ -e "$1" ] || { echo "FAIL: expected artifact missing: $1"; exit 1; }; }

if [ "$DS" != "synthetic" ]; then
  # preflight: weights + dataset visible before burning hours (PARITY.md #2)
  W="$WEIGHTS_DIR/${MODEL}_patch16_224.pth"
  [ -f "$W" ] || { echo "FAIL: pretrained backbone missing: $W (PARITY.md #2)"; exit 1; }
  python - "$DS" <<'EOF'
import sys, os
sys.path.insert(0, os.getcwd())
import jax; jax.config.update("jax_platforms", "cpu")
from schemanet_tpu.utils.config import get_cfg, resolve_subconfig
from schemanet_tpu.data.datasets import get_dataset
cfg = get_cfg(f"configs/{sys.argv[1]}/vanilla/" + sorted(os.listdir(f"configs/{sys.argv[1]}/vanilla"))[0])
ds = get_dataset(resolve_subconfig(cfg["dataset"], os.path.abspath(f"configs/{sys.argv[1]}/vanilla")), "train")
print(f"preflight ok: {len(ds)} train samples, {ds.num_classes} classes")
EOF
fi

EXTRA=""
if [ "$DS" = "synthetic" ]; then
  # tiny-budget overrides so the dry run finishes in minutes on CPU; default
  # to the CPU backend (a busy chip must not block validating the kit)
  export SCHEMANET_PLATFORM=${SCHEMANET_PLATFORM:-cpu}
  EXTRA="-o training.train_epochs=1 -o training.batch_size=8 \
         -o validation.batch_size=8 -o dataset.num_samples=256 \
         -o training.num_workers=1 -o validation.num_workers=1"
fi

say "stage 0: backbone fine-tune"
sh scripts/0.train_backbone.sh "$DS" "$MODEL" $MESH $EXTRA "$@"
need "$RUN_DIR/$DS/vanilla/$MODEL/ckpt/best"

say "stage 1: ingredient extraction (k-means codebook, M=$M)"
sh scripts/1.extract_ingredients.sh "$DS" "$MODEL" "$M" "$MAXF"
need "$RUN_DIR/$DS/ingredient/$MODEL-l9-M_$M/cluster_${M}_from_${MAXF}.npy"

say "stage 2: bundle export"
sh scripts/2.export_bundle.sh "$DS" "$MODEL" "$M" "$K" "$MAXF"
need "$RUN_DIR/$DS/ingredient/$MODEL-l9-M_$M/bundle/manifest.json"

say "stage 3: IR-Atlas init"
sh scripts/3.init_schema_net.sh "$DS" "$MODEL" "$M"
need "$RUN_DIR/$DS/schema_net/init_IR_atlas-$MODEL-l9-M_$M.msgpack"

say "stage 4: SchemaNet training"
sh scripts/4.train_schema_net.sh "$DS" "$MODEL" "$M" $MESH $EXTRA "$@"
need "$RUN_DIR/$DS/schema_net/$MODEL-l9-M_$M/ckpt/best"

say "stage 5: eval worker (top-1 + CB agreement)"
python -m schemanet_tpu.cli train --worker eval_worker \
    --cfg "configs/$DS/schema_net/$MODEL-l9-M_$M.yaml" \
    --log-dir "$RUN_DIR/$DS/eval/$MODEL-l9-M_$M" \
    --resume "$RUN_DIR/$DS/schema_net/$MODEL-l9-M_$M/ckpt/best" \
    -o "schema_net.bundle=$RUN_DIR/$DS/ingredient/$MODEL-l9-M_$M/bundle" \
    -o "schema_net.initial_state_fp=$RUN_DIR/$DS/schema_net/init_IR_atlas-$MODEL-l9-M_$M.msgpack" \
    $EXTRA "$@"

say "DONE — compare the logged top-1 against the reference run (PARITY.md #4)"
