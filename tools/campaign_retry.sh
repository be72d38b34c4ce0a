#!/bin/sh
# Re-run individual campaign steps with a TPU-probe + retry wrapper (the axon
# tunnel flaps; a step that lands in a down-window fails fast with a CPU
# backend error). Usage: sh tools/campaign_retry.sh C D E ...
# Steps mirror tools/chip_campaign.sh; results append to the same log.
cd /root/repo
L=${CAMPAIGN_LOG:-/tmp/chip_campaign.log}

probe() {
  # wait until the chip answers (up to ~30 min), probing every 60 s
  i=0
  while [ $i -lt 30 ]; do
    if timeout 120 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null; then
      return 0
    fi
    i=$((i + 1))
    sleep 60
  done
  return 1
}

run_step() {
  # $1 = step id, $2 = marker, $3 = tail lines, rest = command
  sid=$1; marker=$2; keep=$3; shift 3
  for attempt in 1 2 3; do
    probe || { echo "--- [$sid] SKIPPED: chip never came back ---" >> $L; return 1; }
    out=/tmp/step_${sid}_a${attempt}.log
    timeout 2400 "$@" > "$out" 2>&1
    if grep -q "$marker" "$out"; then
      echo "--- [$sid] retry OK (attempt $attempt) ---" >> $L
      tail -n "$keep" "$out" >> $L
      return 0
    fi
  done
  echo "--- [$sid] FAILED after 3 attempts (see $out) ---" >> $L
  tail -n 20 "$out" >> $L
  return 1
}

for s in "$@"; do
  case $s in
    A) run_step A '"metric"' 3 python bench.py ;;
    B) run_step B '"metric"' 3 env BENCH_SCALE=imagenet python bench.py ;;
    C) run_step C 'img/s' 2 python tools/bench_backbone.py ;;
    D) run_step D '"metric"' 3 env BENCH_SCALE=imagenet BENCH_BATCH=2048 BENCH_REMAT_CLASS_GNN=1 BENCH_IMAGE_BF16=1 python bench.py ;;
    E) run_step E '"metric"' 3 env BENCH_SCALE=imagenet SCHEMANET_GRAPHCONV_BACKEND=pallas python bench.py ;;
    F) run_step F 'TOTAL\|tflops\|bound' 30 python tools/profile_step.py --scale imagenet ;;
    G) run_step G 'TOTAL\|tflops\|bound' 30 python tools/profile_step.py ;;
    H) run_step H '"metric"' 3 env BENCH_SCALE=imagenet BENCH_BATCH=2048 BENCH_REMAT_CLASS_GNN=1 SCHEMANET_GRAPHCONV_BACKEND=pallas BENCH_IMAGE_BF16=1 python bench.py ;;
    I) run_step I '"metric"' 3 env BENCH_SCALE=imagenet BENCH_BATCH=1536 BENCH_REMAT_CLASS_GNN=1 python bench.py ;;
    J) run_step J '"metric"' 3 env BENCH_SCALE=imagenet BENCH_REMAT=none BENCH_REMAT_CLASS_GNN=1 python bench.py ;;
    K) run_step K '"metric"' 3 env BENCH_SCALE=imagenet BENCH_BATCH=1024 BENCH_REMAT_CLASS_GNN=1 python bench.py ;;
    L) run_step L '"metric"' 3 env BENCH_SCALE=imagenet BENCH_STATIC_IDS=0 python bench.py ;;
    M) run_step M 'PASS\|FAIL' 9 python tools/check_dropout_grad.py ;;
    N) run_step N 'p50' 2 python tools/bench_serve.py ;;
    O) run_step O 'img/s' 2 env BENCH_PROFILE=/tmp/xprof_stage0 python tools/bench_backbone.py ;;
    Q) run_step Q 'img/s' 2 python tools/bench_extract.py ;;
    R) run_step R 'img/s' 2 env BENCH_QUANT=1 python tools/bench_extract.py ;;
    S) run_step S '"metric"' 3 env BENCH_QUANT_BACKBONE=1 python bench.py ;;
    T) run_step T '"metric"' 3 env BENCH_SCALE=imagenet BENCH_QUANT_BACKBONE=1 python bench.py ;;
    U) run_step U 'p50' 2 env BENCH_QUANT=1 python tools/bench_serve.py ;;
    AB1) run_step AB1 '"metric"' 3 env SCHEMANET_GNN_LN_BACKEND=xla python bench.py ;;
    AB2) run_step AB2 '"metric"' 3 env BENCH_STATIC_IDS=0 python bench.py ;;
    AB3) run_step AB3 '"metric"' 3 env SCHEMANET_GNN_LN_BACKEND=xla BENCH_STATIC_IDS=0 python bench.py ;;
    AB4) run_step AB4 'img/s' 2 env SCHEMANET_PRNG_IMPL=rbg python tools/bench_backbone.py ;;
    P) sid=P; probe && { timeout 9000 sh tools/ab_graph_precision.sh > /tmp/step_P.log 2>&1; echo "--- [P] bf16 graph-precision A/B gate ---" >> $L; tail -20 /tmp/step_P.log >> $L; } ;;
    AB5) run_step AB5 '"metric"' 3 env BENCH_SCALE=imagenet SCHEMANET_GNN_LN_BACKEND=xla python bench.py ;;
    AB6) run_step AB6 '"metric"' 3 env SCHEMANET_LN_FWD_BUDGET=1300000 python bench.py ;;
    AB7) run_step AB7 '"metric"' 3 env SCHEMANET_LN_FWD_BUDGET=900000 python bench.py ;;
    AB8) run_step AB8 'img/s' 2 env SCHEMANET_LN_FWD_BUDGET=1300000 python tools/bench_backbone.py ;;
    AB9) run_step AB9 '"metric"' 3 env BENCH_SCALE=imagenet SCHEMANET_SYMCONV=two python bench.py ;;
    AB10) run_step AB10 '"metric"' 3 env SCHEMANET_SYMCONV=two python bench.py ;;
    # X-steps: bisect the cifar default-step regression (85 -> 97.6 ms between
    # the round-2 snapshot and the round-3 differentiable-kernel rewrite) by
    # swapping one fused kernel at a time back to the XLA path.
    X1) run_step X1 '"metric"' 3 env SCHEMANET_ATTN_BACKEND=xla python bench.py ;;
    X2) run_step X2 '"metric"' 3 env SCHEMANET_LN_BACKEND=xla SCHEMANET_MLP_BACKEND=pallas python bench.py ;;
    X3) run_step X3 '"metric"' 3 env SCHEMANET_MLP_BACKEND=xla python bench.py ;;
    X4) run_step X4 '"metric"' 3 env SCHEMANET_ATTN_BACKEND=xla SCHEMANET_LN_BACKEND=xla SCHEMANET_MLP_BACKEND=xla SCHEMANET_SYMCONV=two BENCH_STATIC_IDS=0 python bench.py ;;
    # X5/X6: candidate new defaults after X2 showed LN->xla recovers 10 ms of
    # the cifar regression (97.56 -> 87.54); combine with the two-matmul
    # symconv (round-2 formulation) to see if the full 85 ms reproduces.
    X5) run_step X5 '"metric"' 3 env SCHEMANET_LN_BACKEND=xla SCHEMANET_MLP_BACKEND=pallas SCHEMANET_SYMCONV=two python bench.py ;;
    X6) run_step X6 '"metric"' 3 env BENCH_SCALE=imagenet SCHEMANET_LN_BACKEND=xla SCHEMANET_MLP_BACKEND=pallas python bench.py ;;
    # R2: machine-drift control — run the round-2 snapshot's bench.py from a
    # worktree (git worktree add /tmp/r2bench 339c9f2) on today's chip. If it
    # no longer reproduces ~85 ms, part of the "regression" is chip/tunnel
    # drift, not code.
    R2) run_step R2 '"metric"' 3 sh -c '[ -d /tmp/r2bench ] || git -C /root/repo worktree add /tmp/r2bench 339c9f2; cd /tmp/r2bench && python bench.py' ;;
    # ---- round-4 steps ----------------------------------------------------
    # C2: stage-0 with the round-3 LN default (pallas) vs the new policy
    # default (xla, step C) — decides whether backbone TRAINING keeps the
    # fused LN while the frozen-forward default moved to xla.
    C2) run_step C2 'img/s' 2 env SCHEMANET_LN_BACKEND=pallas python tools/bench_backbone.py ;;
    # B1: bf16-resident input batch at cifar scale (saves the fp32->bf16
    # convert of the [1024,224,224,3] input, ~0.9 GB HBM traffic per step)
    B1) run_step B1 '"metric"' 3 env BENCH_IMAGE_BF16=1 python bench.py ;;
    # AT1/AT2: attention fwd block-budget sweep at the cifar schema step
    AT1) run_step AT1 '"metric"' 3 env SCHEMANET_ATTN_FWD_BUDGET=4000000 python bench.py ;;
    AT2) run_step AT2 '"metric"' 3 env SCHEMANET_ATTN_FWD_BUDGET=1000000 python bench.py ;;
    # BL*: whole-encoder-half fused kernels (ops/pallas/encoder_block.py) on
    # the frozen backbone forward — cifar schema step / imagenet / extraction
    BL1) run_step BL1 '"metric"' 3 env SCHEMANET_BLOCK_BACKEND=pallas python bench.py ;;
    BL2) run_step BL2 '"metric"' 3 env BENCH_SCALE=imagenet SCHEMANET_BLOCK_BACKEND=pallas python bench.py ;;
    BL3) run_step BL3 'img/s' 2 env SCHEMANET_BLOCK_BACKEND=pallas python tools/bench_extract.py ;;
    BL4) run_step BL4 '"metric"' 3 env SCHEMANET_BLOCK_BACKEND=pallas SCHEMANET_BLOCK_FWD_BUDGET=1000000 python bench.py ;;
    BL5) run_step BL5 '"metric"' 3 env SCHEMANET_BLOCK_BACKEND=pallas SCHEMANET_BLOCK_FWD_BUDGET=4000000 python bench.py ;;
    # I2: imagenet big-batch retry with full remat (bs=2048 OOMed under dots)
    I2) run_step I2 '"metric"' 3 env BENCH_SCALE=imagenet BENCH_BATCH=2048 BENCH_REMAT=full BENCH_REMAT_CLASS_GNN=1 BENCH_IMAGE_BF16=1 python bench.py ;;
    # V: dropout gradient validator (interpret-oracle comparison)
    V) run_step V 'PASS\|FAIL' 12 python tools/check_dropout_grad.py ;;
    # A3: cifar bs=2048 operating point (class-GNN work is batch-independent)
    A3) run_step A3 '"metric"' 3 env BENCH_BATCH=2048 python bench.py ;;
    # VQ1: streaming-argmin Pallas VQ at cifar scale
    VQ1) run_step VQ1 '"metric"' 3 env SCHEMANET_VQ_BACKEND=pallas python bench.py ;;
    # E1: fused Pallas GraphConv at cifar scale (the GNN matcher is ~22% of
    # the 74.3 ms default step, mostly HBM on E_sym round trips)
    E1) run_step E1 '"metric"' 3 env SCHEMANET_GRAPHCONV_BACKEND=pallas python bench.py ;;
    # OPT1/OPT2: fused AdamW+projection for the atlas tensors
    # (ops/pallas/atlas_opt.py) — removes the separate projection HBM sweep
    OPT1) run_step OPT1 '"metric"' 3 env BENCH_ATLAS_OPT=fused python bench.py ;;
    OPT2) run_step OPT2 '"metric"' 3 env BENCH_SCALE=imagenet BENCH_ATLAS_OPT=fused python bench.py ;;
    # I3: bs=1536 at the [J]-winning remat config (no global remat, class-GNN
    # remat only) — the class-GNN's 61% of the step ([F2]) is batch-
    # independent, so a bigger batch amortises it IF the kept instance
    # residuals still fit (bs=1536 under `dots` OOMed, [I])
    I3) run_step I3 '"metric"' 3 env BENCH_SCALE=imagenet BENCH_BATCH=1536 BENCH_REMAT=none BENCH_REMAT_CLASS_GNN=1 BENCH_IMAGE_BF16=1 python bench.py ;;
    # E2: [E] (imagenet fused Pallas GraphConv) combined with the I3 batch
    E2) run_step E2 '"metric"' 3 env BENCH_SCALE=imagenet BENCH_BATCH=1536 BENCH_REMAT=none BENCH_REMAT_CLASS_GNN=1 BENCH_IMAGE_BF16=1 SCHEMANET_GRAPHCONV_BACKEND=pallas python bench.py ;;
    # E3: with the fused GraphConv default ([E] win), the class-GNN's largest
    # residuals (E_sym, t) never materialise — maybe the class-GNN remat no
    # longer pays its ~13 ms recompute
    E3) run_step E3 '"metric"' 3 env BENCH_SCALE=imagenet BENCH_REMAT_CLASS_GNN=0 python bench.py ;;
    *) echo "unknown step $s" ;;
  esac
done
echo "=== retry batch done ($*) $(date) ===" >> $L
