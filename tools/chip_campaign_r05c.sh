#!/bin/sh
# Round-5 chip campaign, part c: measure the attn_hmean capture fusion
# (fee723b) and the larger-batch operating points that [B2048] (4,590 img/s,
# no remat) opened up, all at the post-part-b HEAD whose zero-env defaults
# carry the part-b winners. Run from a worktree pinned at that commit.
cd "${CAMPAIGN_TREE:-/root/repo}"
L=${CAMPAIGN_LOG:-/root/repo/bench_campaign_r05.log}
echo "=== r05 campaign part c start $(date -u) @ $(git rev-parse --short HEAD) tree=$(pwd) ===" >> $L

echo "--- [HM-c] cifar zero-env at HEAD (attn_hmean capture fused) ---" >> $L
timeout 2400 python bench.py 2>&1 | tail -3 >> $L
true
echo "--- [HM-i] imagenet zero-env at HEAD (vs BASE-I 4274 @ bs=1536) ---" >> $L
BENCH_SCALE=imagenet BENCH_BATCH=1536 timeout 2400 python bench.py 2>&1 | tail -3 >> $L
true
echo "--- [B2048h] imagenet bs=2048 at HEAD (vs part-b B2048 4590) ---" >> $L
BENCH_SCALE=imagenet BENCH_BATCH=2048 timeout 2400 python bench.py 2>&1 | tail -3 >> $L
true
echo "--- [B3072] imagenet bs=3072, NO remat ---" >> $L
BENCH_SCALE=imagenet BENCH_BATCH=3072 timeout 2400 python bench.py 2>&1 | tail -3 >> $L
true
echo "--- [B2560] imagenet bs=2560 (fallback operating point) ---" >> $L
BENCH_SCALE=imagenet BENCH_BATCH=2560 timeout 2400 python bench.py 2>&1 | tail -3 >> $L
true
echo "--- [HXM] extraction at HEAD (hmean capture on the frozen fwd) ---" >> $L
BENCH_MODEL=small timeout 2400 python tools/bench_extract.py 2>&1 | tail -2 >> $L
true
echo "--- [F2c] imagenet profile at the final operating point ---" >> $L
timeout 2400 python tools/profile_step.py --scale imagenet 2>&1 | tail -30 >> $L
true
echo "=== r05 campaign part c done $(date -u) ===" >> $L
