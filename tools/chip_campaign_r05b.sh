#!/bin/sh
# Round-5 chip campaign, part b: the arms of tools/chip_campaign_r05.sh that
# had not yet run when the previous builder session ended mid-[B2048]
# (bench_campaign_r05.log stops there; BASE-C/BASE-I/F1 completed).
#
# Runs from CAMPAIGN_TREE (a git worktree pinned at the measurement commit)
# so the main checkout stays editable while arms are in flight — background
# arms import the tree at their own start, and half-landed edits crash them.
# Shares the main tree's warm compile cache via JAX_COMPILATION_CACHE_DIR.
cd "${CAMPAIGN_TREE:-/root/repo}"
L=${CAMPAIGN_LOG:-/root/repo/bench_campaign_r05.log}
echo "=== r05 campaign part b start $(date -u) @ $(git rev-parse --short HEAD) tree=$(pwd) ===" >> $L

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
echo "=== r05 campaign part b done $(date -u) ===" >> $L
