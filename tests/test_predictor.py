"""End-to-end SchemaNetPredictor: one jitted forward, gradient flow, CB path."""

import numpy as np

import jax
import jax.numpy as jnp

from schemanet_tpu.schema import build_predictor, get_loss_fn, weighted_total

MODEL_CFG = {
    "name": "vit",
    "transformer": {
        "embed_dim": 32,
        "num_encoder_layers": 4,
        "num_heads": 2,
        "dim_feedforward": 64,
        "dropout": None,
        "activation": "gelu",
        "final_norm": True,
        "norm_eps": 1e-6,
    },
    "patch_embed": {"img_size": 32, "patch_size": 8, "image_channels": 3},
    "pos_encoding": {"name": "learnable"},
}
SCHEMA_CFG = {
    "matcher": {"similarity": "inner_product"},
    "gnn": {"embed_dim": 16, "num_layers": 2, "activation": "relu"},
    "ir_atlas": {
        "class_max_vertices": None,
        "dist_pow": 2,
        "feat_h": 4,
        "feat_w": 4,
        "clamp_vertex_attn": -1.0,
        "clamp_edge_attn": -1.0,
        "remove_self_loop": False,
        "prune_node_threshold": 0.001,
    },
}
K, M, D = 5, 12, 32


def make_predictor():
    return build_predictor(
        MODEL_CFG, SCHEMA_CFG, num_classes=K, num_codes=M, code_dim=D, encode_layer=1
    )


def test_predictor_forward_and_grads(rng):
    predictor = make_predictor()
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    variables = predictor.init(jax.random.PRNGKey(0), x)
    params, buffers = variables["params"], variables["buffers"]

    out = jax.jit(
        lambda p, b, x: predictor.apply({"params": p, "buffers": b}, x)
    )(params, buffers, x)
    assert out["pred"].shape == (2, K)
    assert out["class_vertices"].shape == (K, M)
    assert out["class_edges"].shape == (K, M, M)

    loss_fn = get_loss_fn({"name": "schema_inference_loss"})
    weights = {"cls": 1.0, "re_entropy_vertex": 0.5, "re_entropy_edge": 0.75}
    labels = jnp.asarray(rng.integers(0, K, size=(2,)))

    def total(p):
        out = predictor.apply({"params": p, "buffers": buffers}, x)
        return weighted_total(loss_fn(out, {"label": labels}), weights)

    grads = jax.grad(total)(params)
    flat = jax.tree_util.tree_leaves_with_path(grads)
    frozen_norm = trainable_norm = 0.0
    for path, g in flat:
        name = jax.tree_util.keystr(path)
        norm = float(jnp.abs(g).sum())
        # backbone params live at 'backbone/...'; codebook at
        # 'ingredient_backbone/vocabulary' — both frozen
        if "ingredient_backbone" in name or name.startswith("['backbone']"):
            frozen_norm += norm
        else:
            trainable_norm += norm
    # frozen backbone + codebook receive exactly zero gradient
    assert frozen_norm == 0.0
    assert trainable_norm > 0.0
    # atlas + matcher specifically receive gradient
    assert float(jnp.abs(grads["schema_net"]["vertex_weights"]).sum()) > 0
    assert float(jnp.abs(grads["schema_net"]["vertex_attribute_weights"]).sum()) > 0
    assert float(jnp.abs(grads["matcher"]["gnn"]["embedding"]).sum()) > 0


def test_cb_agreement_path(rng):
    """classify_discretized with quantize on/off (CBEvaluation's two passes)."""
    predictor = make_predictor()
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    variables = predictor.init(jax.random.PRNGKey(0), x, method="init_full")

    def run(quantize):
        return predictor.apply(
            variables,
            x,
            quantize,
            method=lambda m, img, q: m.ingredient_backbone.classify_discretized(img, q),
        )

    pred_q = run(True)
    pred_o = run(False)
    assert pred_q.shape == (2, K) and pred_o.shape == (2, K)
    # quantised and original logits differ (codebook is random)
    assert not np.allclose(np.asarray(pred_q), np.asarray(pred_o))
    # quantize=False equals the plain backbone forward
    plain = predictor.backbone.apply({"params": variables["params"]["backbone"]}, x)["pred"]
    np.testing.assert_allclose(np.asarray(pred_o), np.asarray(plain), rtol=1e-4, atol=1e-5)
