#!/usr/bin/env python
"""Step-time attribution for the SchemaNet train step (PERFORMANCE.md data).

Times, on the real chip with host-fetch (block_until_ready is unreliable on
this backend):
  0. pure bf16 matmul sustained rate (scan-chained, one program)
  1. frozen ViT forward (to encode layer)
  2. + VQ + instance graph build
  3. full predictor forward (adds atlas renorm + GNN instance/class + match)
  4. full train step (adds loss, backward, AdamW, projection)

Usage: python tools/bench_ablate.py [bs]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args, steps, warmup=8, name=""):
    import jax

    out = None
    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / steps
    print(f"{name::<42} {dt*1000:8.2f} ms/step", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from schemanet_tpu.schema import build_predictor, get_loss_fn, weighted_total
    from schemanet_tpu.schema.atlas import project_atlas_params

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    steps = int(os.environ.get("ABLATE_STEPS", 20))

    # --- 0: pure bf16 matmul rate -------------------------------------------
    n = 8192
    a = jnp.ones((n, n), jnp.bfloat16)

    @jax.jit
    def chain(a):
        def body(x, _):
            return jax.lax.dot(x, x, precision=jax.lax.Precision.DEFAULT) * (1.0 / n), None
        y, _ = jax.lax.scan(body, a, None, length=8)
        return y

    dt = timed(chain, (a,), steps, name=f"matmul chain 8x{n}^3 bf16")
    print(f"  -> sustained {8 * 2 * n**3 / dt / 1e12:.1f} TFLOP/s", flush=True)

    # --- model setup (same as bench.py) --------------------------------------
    model_cfg = {
        "name": "vit",
        "transformer": dict(
            embed_dim=192, num_encoder_layers=12, num_heads=3, dim_feedforward=768,
            dropout=None, activation="gelu", final_norm=True, norm_eps=1e-6,
        ),
        "patch_embed": dict(img_size=224, patch_size=16, image_channels=3),
        "pos_encoding": dict(name="learnable"),
    }
    schema_cfg = {
        "matcher": {"similarity": "inner_product"},
        "gnn": {"embed_dim": 256, "num_layers": 2, "activation": "relu"},
        "ir_atlas": dict(
            class_max_vertices=None, dist_pow=2, feat_h=14, feat_w=14,
            clamp_vertex_attn=-1.0, clamp_edge_attn=-1.0,
            remove_self_loop=False, prune_node_threshold=0.001,
            graph_precision="default",
        ),
    }
    predictor = build_predictor(
        model_cfg, schema_cfg, num_classes=100, num_codes=1024, code_dim=192,
        encode_layer=9, dtype=jnp.bfloat16,
    )
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        variables = predictor.init(jax.random.PRNGKey(0), jnp.zeros((2, 224, 224, 3)))
    dev = jax.devices()[0]
    params = jax.device_put(variables["params"], dev)
    buffers = jax.device_put(variables["buffers"], dev)
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.normal(size=(bs, 224, 224, 3)).astype(np.float32))
    label = jnp.asarray(rng.integers(0, 100, size=(bs,)), jnp.int32)

    # --- 1: frozen ViT forward ----------------------------------------------
    @jax.jit
    def vit_fwd(p, img):
        return predictor.apply(
            {"params": p, "buffers": buffers}, img,
            method=lambda m, x: m.ingredient_backbone(x)["ingredients"],
        )

    timed(vit_fwd, (params, image), steps, name="1 frozen ViT fwd (+VQ)")

    # --- 2: + instance graph build ------------------------------------------
    @jax.jit
    def graphs(p, img):
        out = predictor.apply(
            {"params": p, "buffers": buffers}, img, method="build_instance_graphs"
        )
        return out["instance"]["instance_edges"]

    timed(graphs, (params, image), steps, name="2 fwd + instance graph build")

    # --- 3: full predictor forward ------------------------------------------
    @jax.jit
    def full_fwd(p, img):
        return predictor.apply({"params": p, "buffers": buffers}, img)["pred"]

    timed(full_fwd, (params, image), steps, name="3 full predictor fwd (+class GNN)")

    # --- 4: full train step ---------------------------------------------------
    loss_fn = get_loss_fn({"name": "schema_inference_loss"})
    weights = {"cls": 1.0, "re_entropy_vertex": 0.5, "re_entropy_edge": 0.75}
    atlas_cfg = predictor.cfg.atlas
    train_params = {k: params[k] for k in ("schema_net", "matcher")}
    frozen = {k: params[k] for k in ("backbone", "ingredient_backbone")}
    tx = optax.adamw(1e-3)
    opt_state = tx.init(train_params)

    @jax.jit
    def train_step(tp, opt, img, lab):
        tp = dict(tp, schema_net=project_atlas_params(tp["schema_net"], atlas_cfg))

        def compute(q):
            out = predictor.apply({"params": dict(frozen, **q), "buffers": buffers}, img)
            return weighted_total(loss_fn(out, {"label": lab}), weights)

        loss, grads = jax.value_and_grad(compute)(tp)
        updates, opt2 = tx.update(grads, opt, tp)
        return optax.apply_updates(tp, updates), opt2, loss

    def step4(tp, opt, img, lab):
        tp, opt, loss = train_step(tp, opt, img, lab)
        return loss

    timed(step4, (train_params, opt_state, image, label), steps,
          name="4 full train step (loss+bwd+adamw)")


if __name__ == "__main__":
    main()
