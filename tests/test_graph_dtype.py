"""Graph-pipeline storage dtype: graph_precision='default' emits bf16 tensors.

The training-precision mode (gated on-chip by the bf16 accuracy A/B,
PERFORMANCE.md #3) stores every [bs, L, L] / [K, V, V] graph tensor in bf16 —
halving the HBM sweeps that dominate the non-backbone step share — while all
reductions and the softmax/entropy math stay fp32. 'highest' must remain pure
fp32 (bit-parity with the reference C++/torch oracles).

Reference semantics anchor: /root/reference/schema_inference/graph/utils.py:25-34
(fp32 throughout — 'highest' is the parity mode; 'default' is the measured-
equivalent training mode).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from schemanet_tpu.ops import graph as ops
from schemanet_tpu.schema.atlas import AtlasConfig, SchemaAtlas
from schemanet_tpu.schema.loss import get_loss_fn

BS, L, M = 4, 16, 32


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _inputs(rng):
    ingredients = jnp.asarray(rng.integers(0, M, (BS, L)), jnp.int32)
    attn = jnp.asarray(rng.normal(size=(BS, L, L)).astype(np.float32))
    attn_cls = jnp.asarray(rng.normal(size=(BS, L)).astype(np.float32))
    geo = jnp.asarray(rng.random((L, L)).astype(np.float32))
    w = jnp.asarray(rng.random((2, 1)).astype(np.float32))
    return ingredients, attn, attn_cls, geo, w


def test_instance_ops_default_dtype_and_value(rng):
    ingredients, attn, attn_cls, geo, w = _inputs(rng)
    slots = ops.compact_instance_slots(ingredients, num_codes=M)
    v_hi = ops.instance_vertices(slots, attn_cls, w, None, precision="highest")
    v_lo = ops.instance_vertices(slots, attn_cls, w, None, precision="default")
    e_hi = ops.instance_edges(slots, attn, geo, w, precision="highest")
    e_lo = ops.instance_edges(slots, attn, geo, w, precision="default")
    assert v_hi.dtype == jnp.float32 and e_hi.dtype == jnp.float32
    assert v_lo.dtype == jnp.bfloat16 and e_lo.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(v_lo, np.float32), np.asarray(v_hi), rtol=0, atol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(e_lo, np.float32), np.asarray(e_hi), rtol=0, atol=2e-2
    )
    # padding stays exactly zero in both modes
    mask = np.asarray(slots.mask)
    assert np.all(np.asarray(v_lo, np.float32)[~mask] == 0)


def test_class_limited_edges_default_dtype(rng):
    ingredients, attn, _, geo, w = _inputs(rng)
    labels = jnp.asarray(rng.integers(0, 3, (BS,)), jnp.int32)
    class_ing = jnp.asarray(rng.integers(0, M, (3, 8)), jnp.int32)
    e_hi = ops.class_limited_edges(
        ingredients, attn, geo, labels, class_ing, w, precision="highest"
    )
    e_lo = ops.class_limited_edges(
        ingredients, attn, geo, labels, class_ing, w, precision="default"
    )
    assert e_hi.dtype == jnp.float32 and e_lo.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(e_lo, np.float32), np.asarray(e_hi), rtol=0, atol=2e-2
    )


@pytest.mark.parametrize("precision,want", [("highest", jnp.float32), ("default", jnp.bfloat16)])
def test_atlas_getters_dtype(rng, precision, want):
    cfg = AtlasConfig(
        num_vertices=M,
        num_classes=3,
        prune_node_threshold=0.001,
        remove_self_loop=True,
        graph_precision=precision,
    )
    atlas = SchemaAtlas(cfg)
    params = atlas.init(jax.random.PRNGKey(0), method="get_atlas")

    out = atlas.apply(params, method="get_atlas")
    assert out["class_vertices"].dtype == want
    assert out["class_edges"].dtype == want
    # values match the pure-fp32 ('highest') getter up to bf16 rounding
    cfg_hi = AtlasConfig(
        num_vertices=M,
        num_classes=3,
        prune_node_threshold=0.001,
        remove_self_loop=True,
        graph_precision="highest",
    )
    ref = SchemaAtlas(cfg_hi).apply(params, method="get_atlas")
    np.testing.assert_allclose(
        np.asarray(out["class_edges"], np.float32),
        np.asarray(ref["class_edges"]),
        rtol=0,
        atol=1e-2,
    )


def test_schema_loss_upcasts_bf16_atlas(rng):
    loss_fn = get_loss_fn({"name": "schema_inference_loss"})
    k, v = 3, 8
    vert = jnp.asarray(rng.random((k, v)).astype(np.float32))
    vert = vert / vert.sum(-1, keepdims=True)
    edge = jnp.asarray(rng.random((k, v, v)).astype(np.float32))
    edge = edge / edge.sum(-1, keepdims=True)
    pred = jnp.asarray(rng.normal(size=(BS, k)).astype(np.float32))
    target = {"label": jnp.asarray(rng.integers(0, k, (BS,)), jnp.int32)}
    out32 = loss_fn({"pred": pred, "class_vertices": vert, "class_edges": edge}, target)
    out16 = loss_fn(
        {
            "pred": pred,
            "class_vertices": vert.astype(jnp.bfloat16),
            "class_edges": edge.astype(jnp.bfloat16),
        },
        target,
    )
    for key in out32:
        assert out16[key].dtype == jnp.float32, key
        np.testing.assert_allclose(
            float(out16[key]), float(out32[key]), rtol=2e-2, atol=2e-2
        )


def test_grad_flows_to_fp32_params_through_bf16_getters(rng):
    """Cotangents cross the bf16 getter boundary and land as fp32 param grads."""
    cfg = AtlasConfig(num_vertices=M, num_classes=3, graph_precision="default")
    atlas = SchemaAtlas(cfg)
    params = atlas.init(jax.random.PRNGKey(0), method="get_atlas")

    buffers = {k: v for k, v in params.items() if k != "params"}

    def loss(p):
        out = atlas.apply({"params": p, **buffers}, method="get_atlas")
        return jnp.sum(out["class_edges"].astype(jnp.float32) ** 2) + jnp.sum(
            out["class_vertices"].astype(jnp.float32) ** 2
        )

    g = jax.grad(loss)(params["params"])
    assert g["edge_weights"].dtype == jnp.float32
    assert np.isfinite(np.asarray(g["edge_weights"])).all()
    assert float(jnp.abs(g["edge_weights"]).max()) > 0
