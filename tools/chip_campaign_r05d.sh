#!/bin/sh
# Round-5 chip campaign, part d: the environment reset between builder
# sessions destroyed every uncommitted part-b/c artifact (logs, run dirs,
# .jax_cache) — only [B2048]=4,590 img/s survived, quoted in
# chip_campaign_r05c.sh. This script re-runs the whole remaining r05
# program in one serial chain, decision arms first:
#   1. fresh zero-env baselines at HEAD (hmean-capture fusion fee723b in)
#   2. atlas-moments / project-timing / attn-pair-pack A/Bs (both scales)
#   3. the atlas-moments ACCURACY gate (rebuilds stage 0-3 artifacts)
#   4. big-batch imagenet operating points
#   5. extraction + serve benches, final profile
# Runs from CAMPAIGN_TREE (worktree pinned at the measurement commit) so
# the main checkout stays editable; shares the main tree's compile cache.
cd "${CAMPAIGN_TREE:-/root/repo}"
L=${CAMPAIGN_LOG:-/root/repo/bench_campaign_r05.log}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}
echo "=== r05 campaign part d start $(date -u) @ $(git rev-parse --short HEAD) tree=$(pwd) ===" >> $L

arm () {  # $1 = label, rest = command
  lbl=$1; shift
  echo "--- [$lbl] $(date -u +%H:%M:%S) ---" >> $L
  timeout 2400 "$@" 2>&1 | tail -3 >> $L
  true
}

# -- 1. baselines (double as the [HM] post-fusion measurements) --
arm BASE-C python bench.py
arm BASE-I env BENCH_SCALE=imagenet python bench.py

# -- 2. decision A/Bs --
arm AM-bi env BENCH_SCALE=imagenet BENCH_ATLAS_MOMENTS=bf16 python bench.py
arm AM-fi env BENCH_SCALE=imagenet BENCH_ATLAS_MOMENTS=factored python bench.py
arm AM-bc env BENCH_ATLAS_MOMENTS=bf16 python bench.py
arm AM-fc env BENCH_ATLAS_MOMENTS=factored python bench.py
arm PT-i env BENCH_SCALE=imagenet BENCH_PROJECT_TIMING=post python bench.py
arm PT-c env BENCH_PROJECT_TIMING=post python bench.py
arm HP-c env SCHEMANET_ATTN_PACK=pair python bench.py
arm HP-i env BENCH_SCALE=imagenet SCHEMANET_ATTN_PACK=pair python bench.py

# -- 3. atlas-moments accuracy gate: rebuild stage 0-3 + fp32 baseline arm
#       (ab_graph_precision runs default+highest; we only need `default`,
#        so run the stages by hand up to the default arm), then the two
#        low-memory-moment arms --
RUN=/root/repo/run/ab_gp_r05
mkdir -p $RUN
echo "--- [GATE-SETUP] stage 0-3 rebuild $(date -u +%H:%M:%S) ---" >> $L
AB_RUN=$RUN AB_ONLY_DEFAULT=1 timeout 7200 sh tools/ab_graph_precision.sh \
  > $RUN/gate_setup.stdout 2>&1
tail -2 $RUN/gate_setup.stdout >> $L
echo "--- [AMG] atlas-moments accuracy gate $(date -u +%H:%M:%S) ---" >> $L
AB_RUN=$RUN timeout 4800 sh tools/ab_atlas_moments.sh \
  > $RUN/atlas_moments_gate.stdout 2>&1
tail -4 $RUN/atlas_moments_gate.stdout >> $L

# -- 4. imagenet operating points (part-b B2048 hit 4,590; push further) --
arm B2048 env BENCH_SCALE=imagenet BENCH_BATCH=2048 python bench.py
arm B2560 env BENCH_SCALE=imagenet BENCH_BATCH=2560 python bench.py
arm B3072 env BENCH_SCALE=imagenet BENCH_BATCH=3072 python bench.py

# -- 5. extraction + serve + final profile --
arm HX-0 env BENCH_MODEL=small python tools/bench_extract.py
arm HX-p env BENCH_MODEL=small SCHEMANET_ATTN_PACK=pair python tools/bench_extract.py
arm SRV python tools/bench_serve.py
echo "--- [F2c] imagenet profile at HEAD $(date -u +%H:%M:%S) ---" >> $L
timeout 2400 python tools/profile_step.py --scale imagenet --top 40 2>&1 | tail -55 >> $L
true
echo "=== r05 campaign part d done $(date -u) ===" >> $L
