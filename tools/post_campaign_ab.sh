#!/bin/sh
# Post-campaign A/B: bisect the [A]/[B] throughput delta vs the recorded
# round-3 headline (12,350 CIFAR / 397.8 ms ImageNet). Suspects are the two
# default-on changes that landed after that measurement — trace-time static
# ids (3192aa8) and the fused GNN LN (7f358b0) — vs plain chip variance.
# Full (untruncated) logs per step so tracebacks survive.
cd /root/repo
L=/tmp/post_campaign.log
echo "=== post-campaign A/B start $(date) ===" >> $L

echo "--- [AB1] cifar, GNN LN fusion OFF ---" >> $L
SCHEMANET_GNN_LN_BACKEND=xla timeout 2400 python bench.py > /tmp/ab1.full 2>&1
tail -3 /tmp/ab1.full >> $L

echo "--- [AB2] cifar, static ids OFF ---" >> $L
BENCH_STATIC_IDS=0 timeout 2400 python bench.py > /tmp/ab2.full 2>&1
tail -3 /tmp/ab2.full >> $L

echo "--- [AB3] cifar, both OFF (round-3-headline configuration) ---" >> $L
SCHEMANET_GNN_LN_BACKEND=xla BENCH_STATIC_IDS=0 timeout 2400 python bench.py > /tmp/ab3.full 2>&1
tail -3 /tmp/ab3.full >> $L

echo "--- [C-rerun] stage-0 backbone bench, FULL traceback ---" >> $L
timeout 2400 python tools/bench_backbone.py > /tmp/c_rerun.full 2>&1
tail -40 /tmp/c_rerun.full >> $L

echo "--- [AB4] stage-0 backbone, rbg dropout PRNG ---" >> $L
SCHEMANET_PRNG_IMPL=rbg timeout 2400 python tools/bench_backbone.py > /tmp/ab4.full 2>&1
tail -3 /tmp/ab4.full >> $L

echo "=== post-campaign A/B end $(date) ===" >> $L
