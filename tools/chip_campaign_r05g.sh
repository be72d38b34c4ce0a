#!/bin/sh
# Round-5 chip campaign, part g: the priority-ordered remainder of part d2,
# re-sequenced for the session clock. The atlas-moments ACCURACY gate runs
# FIRST (VERDICT r4 #3's done-criterion; nothing else can substitute),
# then the decision A/Bs cheapest-information-first; big-batch operating
# points and the profile run last and are sacrificial if the session ends.
cd "${CAMPAIGN_TREE:-/root/repo}"
L=${CAMPAIGN_LOG:-/root/repo/bench_campaign_r05.log}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}
echo "=== r05 campaign part g start $(date -u) @ $(git rev-parse --short HEAD) tree=$(pwd) ===" >> $L

arm () {
  lbl=$1; shift
  echo "--- [$lbl] $(date -u +%H:%M:%S) ---" >> $L
  timeout 3600 "$@" 2>&1 | tail -3 >> $L
  true
}

# -- atlas-moments accuracy gate: stage 0-3 rebuild + fp32 baseline arm,
#    then bf16 / factored arms --
RUN=/root/repo/run/ab_gp_r05
mkdir -p $RUN
echo "--- [GATE-SETUP] stage 0-3 rebuild $(date -u +%H:%M:%S) ---" >> $L
AB_RUN=$RUN AB_ONLY_DEFAULT=1 timeout 10800 sh tools/ab_graph_precision.sh \
  > $RUN/gate_setup.stdout 2>&1
tail -2 $RUN/gate_setup.stdout >> $L
echo "--- [AMG] atlas-moments accuracy gate $(date -u +%H:%M:%S) ---" >> $L
AB_RUN=$RUN timeout 7200 sh tools/ab_atlas_moments.sh \
  > $RUN/atlas_moments_gate.stdout 2>&1
tail -4 $RUN/atlas_moments_gate.stdout >> $L

# -- decision A/Bs, priority order --
arm PT-i env BENCH_SCALE=imagenet BENCH_PROJECT_TIMING=post python bench.py
arm PT-c env BENCH_PROJECT_TIMING=post python bench.py
arm HP-c env SCHEMANET_ATTN_PACK=pair python bench.py
arm EB-i env BENCH_SCALE=imagenet SCHEMANET_EMBED_BWD=pallas python bench.py
arm B2048 env BENCH_SCALE=imagenet BENCH_BATCH=2048 python bench.py
arm HP-i env BENCH_SCALE=imagenet SCHEMANET_ATTN_PACK=pair python bench.py
arm AM-bc env BENCH_ATLAS_MOMENTS=bf16 python bench.py
arm B2560 env BENCH_SCALE=imagenet BENCH_BATCH=2560 python bench.py
arm HX-0 env BENCH_MODEL=small python tools/bench_extract.py
arm SRV python tools/bench_serve.py
echo "--- [F2c] imagenet profile at HEAD $(date -u +%H:%M:%S) ---" >> $L
timeout 3600 python tools/profile_step.py --scale imagenet --top 40 2>&1 | tail -55 >> $L
true
echo "=== r05 campaign part g done $(date -u) ===" >> $L
