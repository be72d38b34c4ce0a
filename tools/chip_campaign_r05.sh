#!/bin/sh
# Round-5 chip campaign: VERDICT r4 items #2/#3/#5/#6.
# Runs after the bf16 accuracy gate frees the chip; appends to the r05 log.
# Order: fresh baselines first (same-session spread anchor), then the
# candidates ranked by expected ImageNet win.
cd /root/repo
L=${CAMPAIGN_LOG:-bench_campaign_r05.log}
echo "=== r05 chip campaign start $(date -u) @ $(git rev-parse --short HEAD) ===" >> $L

echo "--- [BASE-C] cifar zero-env baseline at HEAD ---" >> $L
timeout 2400 python bench.py 2>&1 | tail -3 >> $L
true
echo "--- [BASE-I] imagenet zero-env baseline at HEAD ---" >> $L
BENCH_SCALE=imagenet timeout 2400 python bench.py 2>&1 | tail -3 >> $L
true
echo "--- [F1] imagenet profile at HEAD (top-40 incl. converts) ---" >> $L
timeout 2400 python tools/profile_step.py --scale imagenet --top 40 2>&1 | tail -55 >> $L
true
echo "--- [B2048] imagenet bs=2048, NO remat (bf16 graph storage freed HBM?) ---" >> $L
BENCH_SCALE=imagenet BENCH_BATCH=2048 timeout 2400 python bench.py 2>&1 | tail -3 >> $L
true
echo "--- [AM-b] imagenet bf16 Adam moments on atlas tensors ---" >> $L
BENCH_SCALE=imagenet BENCH_ATLAS_MOMENTS=bf16 timeout 2400 python bench.py 2>&1 | tail -3 >> $L
true
echo "--- [AM-f] imagenet factored edge nu + bf16 moments ---" >> $L
BENCH_SCALE=imagenet BENCH_ATLAS_MOMENTS=factored timeout 2400 python bench.py 2>&1 | tail -3 >> $L
true
echo "--- [PT-i] imagenet project_timing=post ---" >> $L
BENCH_SCALE=imagenet BENCH_PROJECT_TIMING=post timeout 2400 python bench.py 2>&1 | tail -3 >> $L
true
echo "--- [PT-c] cifar project_timing=post ---" >> $L
BENCH_PROJECT_TIMING=post timeout 2400 python bench.py 2>&1 | tail -3 >> $L
true
echo "--- [HP-c] cifar pair-packed attn halves ---" >> $L
SCHEMANET_ATTN_PACK=pair timeout 2400 python bench.py 2>&1 | tail -3 >> $L
true
echo "--- [HP-i] imagenet pair-packed attn halves ---" >> $L
BENCH_SCALE=imagenet SCHEMANET_ATTN_PACK=pair timeout 2400 python bench.py 2>&1 | tail -3 >> $L
true
echo "--- [HX-0] extraction baseline (frozen fwd, bf16) ---" >> $L
BENCH_MODEL=small timeout 2400 python tools/bench_extract.py 2>&1 | tail -2 >> $L
true
echo "--- [HX-p] extraction pair-packed ---" >> $L
BENCH_MODEL=small SCHEMANET_ATTN_PACK=pair timeout 2400 python tools/bench_extract.py 2>&1 | tail -2 >> $L
true
echo "=== r05 chip campaign done $(date -u) ===" >> $L
