#!/bin/sh
# Round-5 chip campaign, part d2: same arms as part d, with arm timeouts
# sized for TODAY's relay behaviour — a measured ~300 s one-time handshake
# on each process's first device round trip (probe: fetch0 314.6 s, fetch1
# 0.2 s, fetch2 0.2 s), on top of the usual 130-1200 s cold remote compile.
# Part d's 2400 s timeouts killed [BASE-C] mid-compile; arms here get 3600 s
# and share the main tree's persistent compile cache so only the first
# cifar/imagenet arm pays the big compile.
# Decision arms first, then the accuracy gate, operating points, profile.
cd "${CAMPAIGN_TREE:-/root/repo}"
L=${CAMPAIGN_LOG:-/root/repo/bench_campaign_r05.log}
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/root/repo/.jax_cache}
echo "=== r05 campaign part d2 start $(date -u) @ $(git rev-parse --short HEAD) tree=$(pwd) ===" >> $L

arm () {
  lbl=$1; shift
  echo "--- [$lbl] $(date -u +%H:%M:%S) ---" >> $L
  timeout 3600 "$@" 2>&1 | tail -3 >> $L
  true
}

arm BASE-C python bench.py
arm BASE-I env BENCH_SCALE=imagenet python bench.py

arm AM-bi env BENCH_SCALE=imagenet BENCH_ATLAS_MOMENTS=bf16 python bench.py
arm AM-fi env BENCH_SCALE=imagenet BENCH_ATLAS_MOMENTS=factored python bench.py
arm PT-i env BENCH_SCALE=imagenet BENCH_PROJECT_TIMING=post python bench.py
arm PT-c env BENCH_PROJECT_TIMING=post python bench.py
arm HP-c env SCHEMANET_ATTN_PACK=pair python bench.py
arm HP-i env BENCH_SCALE=imagenet SCHEMANET_ATTN_PACK=pair python bench.py
arm EB-i env BENCH_SCALE=imagenet SCHEMANET_EMBED_BWD=pallas python bench.py

arm B2048 env BENCH_SCALE=imagenet BENCH_BATCH=2048 python bench.py
arm B2560 env BENCH_SCALE=imagenet BENCH_BATCH=2560 python bench.py
arm B3072 env BENCH_SCALE=imagenet BENCH_BATCH=3072 python bench.py

# -- atlas-moments accuracy gate (stage 0-3 rebuild + fp32 baseline arm,
#    then the two low-memory-moment arms) --
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

arm AM-bc env BENCH_ATLAS_MOMENTS=bf16 python bench.py
arm AM-fc env BENCH_ATLAS_MOMENTS=factored python bench.py
arm HX-0 env BENCH_MODEL=small python tools/bench_extract.py
arm HX-p env BENCH_MODEL=small SCHEMANET_ATTN_PACK=pair python tools/bench_extract.py
arm SRV python tools/bench_serve.py
echo "--- [F2c] imagenet profile at HEAD $(date -u +%H:%M:%S) ---" >> $L
timeout 3600 python tools/profile_step.py --scale imagenet --top 40 2>&1 | tail -55 >> $L
true
echo "=== r05 campaign part d2 done $(date -u) ===" >> $L
