"""Class-GNN rematerialisation (schema/gnn.py Matcher.remat_class_gnn).

The class-graph GNN's saved residuals are batch-independent but ~5 GB at
ImageNet atlas scale — the HBM that caps the trainable batch size. The
``remat_class_gnn`` knob recomputes them in backward instead. Remat must be
a pure memory/compute trade: logits and every parameter gradient (params are
SHARED with the instance-graph path) must be bit-identical with it on or off.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from schemanet_tpu.schema.gnn import Matcher, StaticIds


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _toy_batch(rng, M=50, K=7, V=12, BS=4, L=10):
    ci = rng.integers(0, M, size=(K, V)).astype(np.int32)
    atlas = {
        "class_vertices": jnp.asarray(rng.random((K, V)).astype(np.float32)),
        "class_edges": jnp.asarray(rng.random((K, V, V)).astype(np.float32)),
        "class_ingredients": jnp.asarray(ci),
    }
    instance = {
        "instance_vertices": jnp.asarray(rng.random((BS, L)).astype(np.float32)),
        "instance_edges": jnp.asarray(rng.random((BS, L, L)).astype(np.float32)),
        "instance_ingredients": jnp.asarray(rng.integers(0, M, size=(BS, L)), jnp.int32),
        "num_slots": jnp.full((BS,), L, jnp.int32),
    }
    return ci, atlas, instance


@pytest.mark.parametrize("static_ids", [False, True])
def test_remat_matches_plain(rng, static_ids):
    M = 50
    ci, atlas, instance = _toy_batch(rng, M=M)
    kw = dict(
        similarity="inner_product",
        num_codes=M,
        embed_dim=32,
        num_layers=2,
        static_class_ids=StaticIds(ci) if static_ids else None,
    )
    plain = Matcher(**kw)
    remat = Matcher(**kw, remat_class_gnn=True)
    params = plain.init(jax.random.PRNGKey(0), instance, atlas)["params"]

    out_p = plain.apply({"params": params}, instance, atlas)
    out_r = remat.apply({"params": params}, instance, atlas)
    np.testing.assert_array_equal(np.asarray(out_p), np.asarray(out_r))

    def loss(m):
        return lambda p: (m.apply({"params": p}, instance, atlas) ** 2).sum()

    g_p = jax.grad(loss(plain))(params)
    g_r = jax.grad(loss(remat))(params)
    flat_p, _ = jax.tree_util.tree_flatten_with_path(g_p)
    flat_r, _ = jax.tree_util.tree_flatten_with_path(g_r)
    assert len(flat_p) == len(flat_r)  # identical (shared) param tree
    for (path, a), (_, b) in zip(flat_p, flat_r):
        np.testing.assert_array_equal(
            np.asarray(b), np.asarray(a), err_msg=jax.tree_util.keystr(path)
        )


def test_remat_region_present_in_jaxpr(rng):
    """The knob must actually emit a remat region (not silently no-op)."""
    M = 50
    ci, atlas, instance = _toy_batch(rng, M=M)
    kw = dict(similarity="inner_product", num_codes=M, embed_dim=32, num_layers=2)
    plain = Matcher(**kw)
    remat = Matcher(**kw, remat_class_gnn=True)
    params = plain.init(jax.random.PRNGKey(0), instance, atlas)["params"]

    def f(m):
        return lambda p: (m.apply({"params": p}, instance, atlas) ** 2).sum()

    jx_r = str(jax.make_jaxpr(jax.grad(f(remat)))(params))
    jx_p = str(jax.make_jaxpr(jax.grad(f(plain)))(params))
    assert "remat" in jx_r
    assert "remat" not in jx_p


def test_build_predictor_threads_knob():
    from schemanet_tpu.schema.predictor import build_predictor

    model_cfg = {
        "name": "vit",
        "transformer": dict(
            embed_dim=32, num_encoder_layers=2, num_heads=2, dim_feedforward=64,
            dropout=None, activation="gelu", final_norm=True, norm_eps=1e-6,
        ),
        "patch_embed": dict(img_size=32, patch_size=16, image_channels=3),
        "pos_encoding": dict(name="learnable"),
    }
    schema_cfg = {
        "gnn": {"embed_dim": 16, "num_layers": 1, "remat_class_gnn": True},
        "ir_atlas": dict(feat_h=2, feat_w=2),
    }
    p = build_predictor(
        model_cfg, schema_cfg, num_classes=3, num_codes=10, code_dim=32,
        encode_layer=1,
    )
    assert p.cfg.remat_class_gnn is True


def test_all_round3_knobs_compose(rng, monkeypatch):
    """remat_class_gnn + fused GraphConv (interpret) + fused LN (interpret)
    together match the plain XLA Matcher in value and every param gradient."""
    import schemanet_tpu.ops.pallas.graphconv as gc

    M = 50
    ci, atlas, instance = _toy_batch(rng, M=M)
    kw = dict(similarity="inner_product", num_codes=M, embed_dim=32, num_layers=2)
    plain = Matcher(**kw)
    fused = Matcher(**kw, remat_class_gnn=True, static_class_ids=StaticIds(ci))
    params = plain.init(jax.random.PRNGKey(0), instance, atlas)["params"]

    out_p = plain.apply({"params": params}, instance, atlas)
    g_p = jax.grad(lambda p: (plain.apply({"params": p}, instance, atlas) ** 2).sum())(
        params
    )

    monkeypatch.setenv("SCHEMANET_GRAPHCONV_BACKEND", "interpret")
    monkeypatch.setenv("SCHEMANET_LN_BACKEND", "interpret")
    monkeypatch.setattr(gc, "shape_fits_kernel", lambda *a, **kw_: True)
    out_f = fused.apply({"params": params}, instance, atlas)
    g_f = jax.grad(lambda p: (fused.apply({"params": p}, instance, atlas) ** 2).sum())(
        params
    )

    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_p), rtol=1e-4, atol=1e-5)
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_p), jax.tree_util.tree_leaves_with_path(g_f)
    ):
        # three different fp32 accumulation orders (banded static-embed
        # backward, Pallas LN partials, fused conv) -> ULP-scale noise only
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=5e-4,
            err_msg=jax.tree_util.keystr(kp),
        )


def test_shipped_imagenet_configs_default_to_no_remat():
    """The round-4 tail default (campaign r04 [E3] 4,279 img/s vs [E2] 3,895
    with class-GNN remat): with the fused GraphConv default the class-GNN's
    E_sym residuals never materialise, so ImageNet-scale configs ship NO
    remat anywhere (`gnn.remat_class_gnn: false`, `remat: false`), and the
    values flow YAML -> build_predictor / TrainerConfig."""
    from schemanet_tpu.utils.config import get_cfg
    from schemanet_tpu.schema.predictor import build_predictor
    from schemanet_tpu.train.trainer import TrainerConfig

    for p in (
        "configs/imagenet/schema_net/deit_small-l9-M_8000.yaml",
        "configs/imagenet/schema_net/deit_base-l9-M_8000.yaml",
    ):
        cfg = get_cfg(p)
        assert cfg["schema_net"]["gnn"]["remat_class_gnn"] is False, p
        tc = TrainerConfig.from_cfg(cfg["training"])
        assert tc.remat is False, p

    embed_dim = 384
    model_cfg = {
        "name": "vit",
        "transformer": dict(
            embed_dim=embed_dim, num_encoder_layers=2,
            num_heads=embed_dim // 64, dim_feedforward=4 * embed_dim,
            dropout=None, activation="gelu", final_norm=True, norm_eps=1e-6,
        ),
        "patch_embed": dict(img_size=224, patch_size=16, image_channels=3),
        "pos_encoding": dict(name="learnable"),
    }
    cfg = get_cfg("configs/imagenet/schema_net/deit_small-l9-M_8000.yaml")
    schema_cfg = dict(cfg["schema_net"], ir_atlas=dict(
        cfg["schema_net"]["ir_atlas"], class_max_vertices=32))
    predictor = build_predictor(
        model_cfg, schema_cfg, num_classes=10, num_codes=64,
        code_dim=embed_dim, encode_layer=1,
    )
    assert predictor.cfg.remat_class_gnn is False
