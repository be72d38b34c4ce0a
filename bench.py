#!/usr/bin/env python
"""Benchmark: SchemaNet training images/sec/chip at CIFAR-100 scale.

Runs the flagship config (DeiT-Tiny 224px backbone, M=1024 codebook, K=100
classes, batch 256 — reference config/cifar_100/schema_net/deit_tiny-l9-M_1024)
as one jitted train step on the available accelerator and reports throughput.

Baseline (see bench_baseline.json): the reference's per-iteration CPU C++
graph build measured at 56.8 img/s on this host — its structural ceiling.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np


def main():
    import jax

    # BENCH_FORCE_CPU=1: pin the CPU backend before first use (the axon
    # sitecustomize overrides the JAX_PLATFORMS env var, so the config knob
    # is the only reliable way) — for off-chip cost-model runs
    if os.environ.get("BENCH_FORCE_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import optax

    from schemanet_tpu.schema import build_predictor, get_loss_fn, weighted_total
    from schemanet_tpu.schema.atlas import project_atlas_params

    # BENCH_SCALE=imagenet runs the reference's largest config (DeiT-Small,
    # M=8000, K=1000, V_max=500, GNN 1024 — imagenet/schema_net/
    # deit_small-l9-M_8000.yaml) with remat; default is the CIFAR-100 flagship.
    scale = os.environ.get("BENCH_SCALE", "cifar100")
    # default operating point bs=1024: the class-GNN + atlas optimizer work is
    # batch-independent (~16 ms/step at CIFAR scale), so larger batches
    # amortise it — measured 10,357 img/s at bs=512 vs 11,276 at bs=1024 with
    # the fused frozen-forward kernels (round 2)
    # the class-GNN + atlas optimizer work is batch-independent and dominates
    # at ImageNet scale (61% of the step, [F2]), so the operating point is
    # the largest batch that fits WITHOUT global remat: bs=1536 +
    # remat_class_gnn + fused GraphConv = 3,895 img/s (r04 [E2]; bs=1024 =
    # 3,255 [B/E]); bs=2048 needs full remat and is slower per image
    # (2,664, [I2]). See PERFORMANCE.md.
    batch_size = int(
        os.environ.get("BENCH_BATCH", 1536 if scale == "imagenet" else 1024)
    )
    num_classes = 1000 if scale == "imagenet" else 100
    num_codes = 8000 if scale == "imagenet" else 1024
    steps = int(os.environ.get("BENCH_STEPS", 50))
    dtype = jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bf16") == "bf16" else jnp.float32

    embed_dim = 384 if scale == "imagenet" else 192
    model_cfg = {
        "name": "vit",
        "transformer": dict(
            embed_dim=embed_dim,
            num_encoder_layers=12,
            num_heads=embed_dim // 64,
            dim_feedforward=4 * embed_dim,
            dropout=None, activation="gelu", final_norm=True, norm_eps=1e-6,
        ),
        "patch_embed": dict(img_size=224, patch_size=16, image_channels=3),
        "pos_encoding": dict(name="learnable"),
    }
    schema_cfg = {
        "matcher": {"similarity": "inner_product"},
        "gnn": {
            "embed_dim": 1024 if scale == "imagenet" else 256,
            "num_layers": 2,
            "activation": "relu",
            # remat_class_gnn: recompute the class-GNN in backward. Was the
            # ImageNet default while the XLA symconv materialised E_sym
            # (~5 GB of residuals, r04 [J] 322.7 vs [B] 362.7 with
            # remat=dots); with the fused GraphConv default those residuals
            # never exist, and dropping the remat wins again: [E3] 4,279
            # img/s at bs=1536 vs [E2] 3,895 with the remat. Default OFF.
            "remat_class_gnn": os.environ.get("BENCH_REMAT_CLASS_GNN", "0")
            == "1",
        },
        # BENCH_QUANT_BACKBONE=1: W8A8 int8 frozen-backbone forward inside
        # the train step (ops/quant.py) — safe gradient-wise (the backbone
        # runs under stop_gradient); measures the int8 MXU-rate win on the
        # step's frozen-forward share
        "quant_backbone": os.environ.get("BENCH_QUANT_BACKBONE", "0") == "1",
        "ir_atlas": dict(
            class_max_vertices=500 if scale == "imagenet" else None,
            dist_pow=2, feat_h=14, feat_w=14,
            clamp_vertex_attn=-1.0, clamp_edge_attn=-1.0,
            remove_self_loop=False, prune_node_threshold=0.001,
            graph_precision="default",
        ),
    }
    # class slot -> code id layout mirrors stage 3 (pipeline/init_schema_net):
    # with V_max < M each class keeps its top-V_max codes (distinct, sorted
    # ascending); with V_max == M the buffer is the identity arange. The
    # buffer is write-once, so it is declared static to the jitted step
    # (schema/gnn.py StaticIds) — the class-embedding backward becomes a
    # trace-time-sorted banded matmul instead of a dynamic scatter-add.
    # BENCH_STATIC_IDS=0 measures the dynamic-scatter path for comparison.
    id_rng = np.random.default_rng(7)
    v_max = 500 if scale == "imagenet" else num_codes
    if v_max < num_codes:
        ci = np.sort(
            np.argsort(id_rng.random((num_classes, num_codes)), axis=1)[:, :v_max],
            axis=1,
        ).astype(np.int32)
    else:
        ci = np.broadcast_to(
            np.arange(v_max, dtype=np.int32), (num_classes, v_max)
        ).copy()
    use_static_ids = os.environ.get("BENCH_STATIC_IDS", "1") == "1"

    predictor = build_predictor(
        model_cfg, schema_cfg, num_classes=num_classes, num_codes=num_codes,
        code_dim=embed_dim, encode_layer=9, dtype=dtype,
        static_class_ids=ci if use_static_ids else None,
    )

    # initialise on the host CPU backend: param init needs no TPU and skipping
    # its TPU compile roughly halves bench startup on remote-compile setups
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        rng = jax.random.PRNGKey(0)
        x_init = jnp.zeros((2, 224, 224, 3), jnp.float32)
        variables = predictor.init(rng, x_init)
    buffers_host = dict(variables["buffers"])
    buffers_host["schema_net"] = dict(
        buffers_host["schema_net"], class_ingredients=jnp.asarray(ci)
    )
    params = jax.device_put(variables["params"], jax.devices()[0])
    buffers = jax.device_put(buffers_host, jax.devices()[0])

    loss_fn = get_loss_fn({"name": "schema_inference_loss"})
    weights = {"cls": 1.0, "re_entropy_vertex": 0.5, "re_entropy_edge": 0.75}
    atlas_cfg = predictor.cfg.atlas

    # frozen backbone + codebook become jit closure constants: they never
    # change during SchemaNet training and keeping them out of the call
    # signature removes ~120 leaves of per-call dispatch overhead
    train_params = {k: params[k] for k in ("schema_net", "matcher")}
    frozen_params = {k: params[k] for k in ("backbone", "ingredient_backbone")}
    HOT = ("vertex_weights", "edge_weights")
    tx = optax.adamw(1e-3)
    # BENCH_ATLAS_MOMENTS=bf16|factored: low-memory Adam moments for the big
    # atlas tensors only (train/common.py adamw_lowmem). "bf16" stores both
    # moments in bf16 (the EMA math stays fp32); "factored" additionally
    # replaces the edge tensors' full second moment with Adafactor-style
    # row/col stats — at ImageNet scale that turns 2 GB of fp32 edge-Adam
    # state (~4 GB/step of pure HBM sweep) into 4 MB. Ignored under the
    # fused-opt path (which owns its own moment buffers).
    # Default: bf16 moments at ImageNet scale (r05 campaign [AM-bi] 334.2 ms
    # vs [BASE-I] 337.9, +1.1%; accuracy gate [AMG] top-1 0.9385 == the fp32
    # arm), fp32 at CIFAR scale (unmeasured there — flip only what was
    # measured). Matches the imagenet YAML's param-group default.
    atlas_moments = os.environ.get(
        "BENCH_ATLAS_MOMENTS", "bf16" if scale == "imagenet" else "fp32"
    )
    if atlas_moments != "fp32" and os.environ.get("BENCH_ATLAS_OPT") != "fused":
        from schemanet_tpu.train.common import adamw_lowmem

        atlas_tx = adamw_lowmem(
            1e-3,
            mu_dtype=jnp.bfloat16,
            nu_dtype=jnp.bfloat16,
            factored_min_size=256 if atlas_moments == "factored" else None,
        )

        def _label(path, _):
            keys = [str(getattr(k, "key", k)) for k in path]
            return "atlas" if keys[0] == "schema_net" and keys[-1] in HOT else "default"

        labels = jax.tree_util.tree_map_with_path(_label, train_params)
        tx = optax.multi_transform(
            {"default": optax.adamw(1e-3), "atlas": atlas_tx}, labels
        )

    # BENCH_ATLAS_OPT=fused: one Pallas pass does AdamW + the atlas projection
    # for the big vertex/edge tensors (ops/pallas/atlas_opt.py) — the
    # projection moves from "before every step" to "fused into the previous
    # update", which sees the gradient at the identical projected point once
    # the params are projected up-front (parity: tests/test_atlas_opt.py)
    use_fused_opt = os.environ.get("BENCH_ATLAS_OPT") == "fused"
    # BENCH_PROJECT_TIMING=post: run the atlas projection right after the
    # optimizer update (same jit program) instead of at the next step's start.
    # The alternating sequence proj->update->proj->update is IDENTICAL (the
    # projection is idempotent and params start projected) but XLA can fuse
    # the projection's read into the AdamW update's write, saving one full
    # cross-step read+write sweep of the [K, V, V] atlas params.
    project_post = os.environ.get("BENCH_PROJECT_TIMING", "pre") == "post"

    def split_hot(tp):
        sn = tp["schema_net"]
        hot = {k: sn[k] for k in HOT}
        rest = dict(tp, schema_net={k: v for k, v in sn.items() if k not in HOT})
        return hot, rest

    if use_fused_opt:
        from schemanet_tpu.ops.pallas.atlas_opt import adamw_project_rows as _apr
        from schemanet_tpu.ops.policy import _on_tpu

        # Mosaic kernels only compile for TPU; interpret keeps the fused
        # path exercisable on the CPU cost-model runs
        adamw_project_rows = partial(_apr, interpret=not _on_tpu())

        train_params = dict(
            train_params,
            schema_net=project_atlas_params(train_params["schema_net"], atlas_cfg),
        )
        hot0, rest0 = split_hot(train_params)
        opt_state = (
            tx.init(rest0),
            jnp.zeros((), jnp.int32),
            jax.tree.map(jnp.zeros_like, hot0),
            jax.tree.map(jnp.zeros_like, hot0),
        )
    else:
        if project_post:
            # start projected: the per-step projection then keeps the invariant
            train_params = dict(
                train_params,
                schema_net=project_atlas_params(train_params["schema_net"], atlas_cfg),
            )
        opt_state = tx.init(train_params)

    # donate params+opt_state: lets XLA update the 105M-param atlas + Adam
    # moments in place instead of allocating fresh buffers every step
    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(train_params, opt_state, image, label_):
        if use_fused_opt:
            # vertex/edge weights are already projected (fused into the
            # previous update); only the cheap attr-weight clamp stays here
            sn = dict(train_params["schema_net"])
            if atlas_cfg.clamp_weights:
                for key in ("vertex_attribute_weights", "edge_attribute_weights"):
                    sn[key] = jnp.clip(sn[key], 0.01, 10.0)
            train_params = dict(train_params, schema_net=sn)
        elif not project_post:
            train_params = dict(
                train_params,
                schema_net=project_atlas_params(train_params["schema_net"], atlas_cfg),
            )

        def compute(tp):
            full = dict(frozen_params, **tp)
            out = predictor.apply({"params": full, "buffers": buffers}, image)
            return weighted_total(loss_fn(out, {"label": label_}), weights)

        remat = os.environ.get("BENCH_REMAT", "none")
        if os.environ.get("BENCH_SCALE") == "imagenet" and remat != "none":
            # Global remat is OFF by default (like the shipped ImageNet
            # configs): with remat_class_gnn freeing the class-GNN residuals,
            # bs=1024 fits without it and runs 322.7 ms/step vs 362.7 with
            # remat=dots (campaign r04 [J] vs [B]). BENCH_REMAT=dots keeps
            # matmul outputs and recomputes elementwise only; BENCH_REMAT=full
            # forces full rematerialisation (needed for bs=2048, step [I2]).
            policy = jax.checkpoint_policies.dots_saveable if remat == "dots" else None
            compute = jax.checkpoint(compute, policy=policy)
        loss, grads = jax.value_and_grad(compute)(train_params)
        if use_fused_opt:
            inner, count, m_hot, v_hot = opt_state
            g_hot, g_rest = split_hot(grads)
            p_hot, p_rest = split_hot(train_params)
            updates, inner2 = tx.update(g_rest, inner, p_rest)
            p_rest = optax.apply_updates(p_rest, updates)
            new_hot, new_m, new_v = {}, {}, {}
            for k in HOT:
                new_hot[k], new_m[k], new_v[k] = adamw_project_rows(
                    p_hot[k], g_hot[k], m_hot[k], v_hot[k], count,
                    lr=1e-3,
                    project=atlas_cfg.apply_normalize,
                    remove_self_loop=(
                        k == "edge_weights" and atlas_cfg.remove_self_loop
                    ),
                )
            params2 = dict(
                p_rest, schema_net=dict(p_rest["schema_net"], **new_hot)
            )
            return params2, (inner2, count + 1, new_m, new_v), loss
        updates, opt_state2 = tx.update(grads, opt_state, train_params)
        new_params = optax.apply_updates(train_params, updates)
        if project_post:
            new_params = dict(
                new_params,
                schema_net=project_atlas_params(new_params["schema_net"], atlas_cfg),
            )
        return new_params, opt_state2, loss

    params = train_params

    data_rng = np.random.default_rng(0)
    # the resident input batch follows the compute dtype (BENCH_IMAGE_BF16=0
    # forces fp32): on bf16 runs this halves the step's image read AND the
    # fp32 buffer (1.23 GB at bs=2048) — representative of the production
    # uint8 pipeline, where Trainer._prep_image normalises straight into the
    # compute dtype so the step never touches an fp32 image (trainer.py).
    # Measured 87.57 -> 86.32 ms at the CIFAR default (campaign r04 [A]/[B1]).
    img_dtype = (
        jnp.float32
        if os.environ.get("BENCH_IMAGE_BF16") == "0" or dtype != jnp.bfloat16
        else jnp.bfloat16
    )
    image = jnp.asarray(
        data_rng.normal(size=(batch_size, 224, 224, 3)).astype(np.float32), img_dtype
    )
    label_ = jnp.asarray(data_rng.integers(0, num_classes, size=(batch_size,)), jnp.int32)

    print(f"bench: compiling train step (bs={batch_size}, dtype={dtype.__name__})...",
          file=sys.stderr, flush=True)
    t_compile = time.perf_counter()

    # XLA's own cost model for the compiled step (exact flop count of the
    # program actually executed, incl. backward); may be unavailable on some
    # plugin backends -> report flops/MFU as null rather than guessing
    flops_per_step = None
    try:
        compiled = train_step.lower(params, opt_state, image, label_).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_per_step = float(cost.get("flops", 0.0)) or None
    except Exception as e:
        print(f"bench: cost_analysis unavailable: {e}", file=sys.stderr)
    # BENCH_COST_ONLY=1: print the cost model and exit without running.
    # Measured check (2026-08): the all-XLA CPU lowering counts 3.27e12
    # (cifar) / 23.8e12 (imagenet) flops vs the TPU lowering's reported
    # 3.46e12 / 22.9e12 — within ±6%, i.e. the TPU cost analysis DOES include
    # the Pallas kernels (Mosaic supplies cost estimates), so no correction
    # is applied to the reported flops.
    if os.environ.get("BENCH_COST_ONLY") == "1":
        print(json.dumps({"flops_per_step": flops_per_step,
                          "batch_size": batch_size, "scale": scale}))
        return
    # generous warmup: beyond the first compile, the first ~10 round-tripped
    # steps pay one-time costs on this backend (layout recompile, lazy constant
    # upload) that would otherwise dominate the timed window
    warmup = int(os.environ.get("BENCH_WARMUP", 10))
    for _ in range(warmup):
        params, opt_state, loss = train_step(params, opt_state, image, label_)
    np.asarray(loss)  # host fetch: block_until_ready is unreliable on axon
    print(f"bench: warm after {time.perf_counter()-t_compile:.0f}s; timing {steps} steps",
          file=sys.stderr, flush=True)

    profile_dir = os.environ.get("BENCH_PROFILE")
    if profile_dir:
        with jax.profiler.trace(profile_dir):
            for _ in range(5):
                params, opt_state, loss = train_step(params, opt_state, image, label_)
            np.asarray(loss)
        print(f"bench: profile trace written to {profile_dir}", file=sys.stderr)

    t0 = time.perf_counter()
    for _ in range(steps):
        params, opt_state, loss = train_step(params, opt_state, image, label_)
    np.asarray(loss)  # host fetch forces completion of the whole chain
    dt = time.perf_counter() - t0

    n_chips = jax.device_count()
    images_per_sec_per_chip = batch_size * steps / dt / n_chips
    step_ms = dt / steps * 1000
    tflops = mfu = None
    if flops_per_step:
        tflops = flops_per_step * steps / dt / 1e12
        # TPU v5e bf16 peak: 197 TFLOP/s/chip (paper number)
        mfu = tflops / n_chips / 197.0

    baseline = 56.8
    try:
        with open(os.path.join(os.path.dirname(__file__), "bench_baseline.json")) as f:
            baseline = json.load(f)["schema_train_images_per_sec_per_chip"]
    except Exception:
        pass

    print(
        json.dumps(
            {
                "metric": "schema_train_images_per_sec_per_chip",
                "value": round(images_per_sec_per_chip, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(images_per_sec_per_chip / baseline, 2),
                "step_ms": round(step_ms, 2),
                "batch_size": batch_size,
                "flops_per_step": flops_per_step,
                "tflops_per_sec": round(tflops, 2) if tflops else None,
                "mfu_vs_v5e_peak": round(mfu, 4) if mfu else None,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
