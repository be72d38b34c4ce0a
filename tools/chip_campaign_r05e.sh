#!/bin/sh
# Round-5 chip campaign, part e: A/B the VMEM-histogram embedding backward
# (ops/pallas/embed_bwd.py — ROADMAP r05 candidate #2, VERDICT r4 #2's
# named lever) at ImageNet scale, where the instance path takes the
# scatter branch (~301k rows into the [8001, 1024] table; CIFAR stays on
# the one-hot branch so there is no CIFAR arm). Then the final zero-env
# confirms at whatever defaults shipped after parts d+e.
# Run from a worktree pinned at the post-part-d-flips commit.
cd "${CAMPAIGN_TREE:-/root/repo}"
L=${CAMPAIGN_LOG:-/root/repo/bench_campaign_r05.log}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}
echo "=== r05 campaign part e start $(date -u) @ $(git rev-parse --short HEAD) tree=$(pwd) ===" >> $L

arm () {
  lbl=$1; shift
  echo "--- [$lbl] $(date -u +%H:%M:%S) ---" >> $L
  timeout 2400 "$@" 2>&1 | tail -3 >> $L
  true
}

arm EB2-i env BENCH_SCALE=imagenet SCHEMANET_EMBED_BWD=pallas2 python bench.py
arm FIN-C python bench.py
arm FIN-I env BENCH_SCALE=imagenet python bench.py
echo "--- [DG] on-chip dropout-grad confirm (hmean-fused attn kernel) ---" >> $L
timeout 3600 python tools/check_dropout_grad.py 2>&1 | tail -6 >> $L
true
echo "=== r05 campaign part e done $(date -u) ===" >> $L
