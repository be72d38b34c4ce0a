#!/bin/sh
# Accuracy gate for low-memory atlas Adam moments (VERDICT r4 #3): stage-4
# SchemaNet training with the default fp32 AdamW vs bf16 moments vs factored
# edge second moment (train/common.py adamw_lowmem, routed through the
# schema_net param group). Reuses the stage 0-3 artifacts of a prior
# tools/ab_graph_precision.sh run (AB_RUN must point at it) so only the two
# extra stage-4 arms burn chip time. PASS = final top-1 within 0.5 pts of
# the fp32 arm (the graph-precision gate's `default` arm is that baseline).
#
# usage: AB_RUN=run/ab_gp_r05 sh tools/ab_atlas_moments.sh
set -e
cd "$(dirname "$0")/.."
RUN=${AB_RUN:-run/ab_gp_r05}
SEED=0
K=${AB_K:-100}
EPOCHS=${AB_EPOCHS:-3}

[ -d "$RUN/ingredient/bundle" ] || { echo "no artifacts under $RUN (run tools/ab_graph_precision.sh first)"; exit 1; }

run_arm () {  # $1 = arm name, remaining args = extra -o overrides
  ARM=$1; shift
  echo "== stage 4: SchemaNet training (moments=$ARM, $EPOCHS epochs) =="
  python -m schemanet_tpu.cli train --worker schema_net_worker \
    --cfg configs/synthetic/schema_net/deit_tiny-l9-M_128.yaml \
    --log-dir $RUN/schema_mom_$ARM --seed $SEED \
    -o dataset.num_classes=$K \
    -o schema_net.bundle=$RUN/ingredient/bundle \
    -o schema_net.initial_state_fp=$RUN/init_IR_atlas.msgpack \
    -o training.train_epochs=$EPOCHS \
    "$@" 2>&1 | tee $RUN/schema_mom_$ARM.stdout
}

run_arm bf16 \
  -o training.param_groups.0.cfg.moment_dtype=bfloat16 \
  -o training.param_groups.0.cfg.nu_dtype=bfloat16
run_arm factored \
  -o training.param_groups.0.cfg.moment_dtype=bfloat16 \
  -o training.param_groups.0.cfg.nu_dtype=bfloat16 \
  -o training.param_groups.0.cfg.nu_factored_min_size=64

echo "== A/B result (fp32 baseline = the graph-precision gate's default arm) =="
grep -o "final eval: .*" $RUN/schema_default.stdout 2>/dev/null | tail -1 | sed 's/^/fp32(default): /'
for ARM in bf16 factored; do
  printf '%s: ' $ARM
  grep -o "final eval: .*" $RUN/schema_mom_$ARM.stdout | tail -1
done
