#!/bin/sh
# Waits for r05 campaign part b to finish, then runs the atlas-moments
# accuracy gate (VERDICT r4 #3) on the freed chip: stage-4 SchemaNet training
# with bf16 / factored Adam moments, reusing the r05 graph-precision gate's
# stage 0-3 artifacts. Arms import the pinned .wt_r05 worktree so the main
# tree stays editable. Results append to the r05 campaign log.
L=${CAMPAIGN_LOG:-/root/repo/bench_campaign_r05.log}
while ! grep -q "r05 campaign part b done" "$L"; do sleep 60; done

echo "--- [AMG] atlas-moments accuracy gate (stage 4 x2, reusing ab_gp_r05) $(date -u) ---" >> $L
cd /root/repo/.wt_r05
AB_RUN=/root/repo/run/ab_gp_r05 sh tools/ab_atlas_moments.sh \
  > /root/repo/run/ab_gp_r05/atlas_moments_gate.stdout 2>&1
{
  printf 'fp32(default arm, gate G1): '
  grep -o "final eval: .*" /root/repo/run/ab_gp_r05/schema_default2.stdout | tail -1
  printf 'bf16 moments: '
  grep -o "final eval: .*" /root/repo/run/ab_gp_r05/schema_mom_bf16.stdout | tail -1
  printf 'factored nu: '
  grep -o "final eval: .*" /root/repo/run/ab_gp_r05/schema_mom_factored.stdout | tail -1
} >> $L
echo "--- [AMG] done $(date -u) ---" >> $L
