#!/bin/sh
# r05: re-run the accuracy gate's `default` arm (it crashed on a mid-run
# source edit — see bench_campaign_r05.log), print the A/B, then chain the
# round-5 chip campaign. Stage 0-3 artifacts are reused as-is.
set -e
cd "$(dirname "$0")/.."
RUN=${AB_RUN:-run/ab_gp_r05}
L=${CAMPAIGN_LOG:-bench_campaign_r05.log}

echo "--- [G1-fix] re-run gate default arm at $(git rev-parse --short HEAD) $(date -u) ---" >> $L
python -m schemanet_tpu.cli train --worker schema_net_worker \
  --cfg configs/synthetic/schema_net/deit_tiny-l9-M_128.yaml \
  --log-dir $RUN/schema_default2 --seed 0 \
  -o dataset.num_classes=100 \
  -o schema_net.bundle=$RUN/ingredient/bundle \
  -o schema_net.initial_state_fp=$RUN/init_IR_atlas.msgpack \
  -o schema_net.ir_atlas.graph_precision=default \
  -o training.train_epochs=3 > $RUN/schema_default2.stdout 2>&1
echo "== [G1] A/B result ==" >> $L
{ printf 'default: '; grep -o "final eval: .*" $RUN/schema_default2.stdout | tail -1; } >> $L
{ printf 'highest: '; grep -o "final eval: .*" $RUN/schema_highest.stdout | tail -1; } >> $L

sh tools/chip_campaign_r05.sh
