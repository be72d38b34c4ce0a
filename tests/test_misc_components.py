"""Tests for auxiliary components: graph export, extra layers, inc eval,
profiling utils, seed helper."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_to_networkx_thresholds(rng):
    nx = pytest.importorskip("networkx")
    from schemanet_tpu.schema.convert_graph import to_networkx

    n = 12
    weights = np.linspace(1.0, 0.0, n)
    adj = rng.uniform(size=(n, n)).astype(np.float64)
    g = to_networkx(weights, adj, edge_threshold=0.2, node_threshold=0.3,
                    node_topk=6, edge_topk=4)
    # only top-6 nodes above 0.3 kept
    assert set(g.nodes) <= set(range(6))
    for _, _, data in g.edges(data=True):
        assert data["weight"] > 0.2
    for node, data in g.nodes(data=True):
        assert data["weight"] > 0.3


def test_atlas_to_networkx_relabels(rng):
    pytest.importorskip("networkx")
    from schemanet_tpu.schema.convert_graph import atlas_to_networkx

    atlas = {
        "class_vertices": np.array([[0.5, 0.3, 0.2]]),
        "class_edges": np.array([rng.uniform(size=(3, 3))]),
        "class_ingredients": np.array([[7, 42, 13]]),
    }
    g = atlas_to_networkx(atlas, 0, node_threshold=0.0, edge_threshold=0.0)
    assert set(g.nodes) <= {7, 42, 13}


def test_extra_layers_shapes(rng):
    from schemanet_tpu.models.layers_extra import (
        ChannelNorm,
        Interpolate,
        LayerNorm2D,
        MLP2D,
        NanBatchNorm,
        conv_out_shape,
    )

    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)).astype(np.float32))
    for mod in (ChannelNorm(), LayerNorm2D()):
        y, _ = mod.init_with_output(jax.random.PRNGKey(0), x)
        assert y.shape == x.shape
    y, _ = MLP2D(embed_dim=4, dim_expand=2.0, out_dim=6).init_with_output(
        jax.random.PRNGKey(0), x
    )
    assert y.shape == (2, 8, 8, 6)
    y, _ = Interpolate(size=(16, 16)).init_with_output(jax.random.PRNGKey(0), x)
    assert y.shape == (2, 16, 16, 4)
    assert conv_out_shape((32, 32), kernel=3, stride=2, padding=1) == (16, 16)

    # NaN-tolerant BN: NaNs don't poison the statistics
    x_nan = x.at[0, 0, 0, 0].set(jnp.nan)
    bn = NanBatchNorm(use_running_average=False)
    variables = bn.init(jax.random.PRNGKey(0), x_nan)
    y, mutated = bn.apply(variables, x_nan, mutable=["batch_stats"])
    assert np.isfinite(np.asarray(mutated["batch_stats"]["mean"])).all()
    finite_out = np.asarray(y)[np.isfinite(np.asarray(x_nan))]
    assert np.isfinite(finite_out).all()


def test_inc_evaluation(rng):
    from schemanet_tpu.data.datasets import build_synthetic
    from schemanet_tpu.data.loader import DataLoader
    from schemanet_tpu.train.evaluator import IncEvaluation

    # 2 tasks x 3 classes; a fake model that is perfect on task-0 labels
    loaders = []
    for t in range(2):
        ds = build_synthetic(num_classes=3, num_samples=12, image_size=8, seed=t)
        ds.labels = ds.labels + 3 * t  # global label space
        loaders.append(DataLoader(ds, batch_size=4, split="val", shuffle=False,
                                  drop_last=False, resize=8, num_workers=1))

    def apply_fn(params, buffers, image, task):
        bs = image.shape[0]
        # oracle on task 0, uniform elsewhere
        logits = jnp.zeros((bs, 6))
        return {"pred": logits.at[:, 0].set(1.0)}

    ev = IncEvaluation(apply_fn, loaders, classes_per_task=[3, 3])
    res = ev({}, {})
    assert 0.0 <= res["acc"] <= 1.0
    assert set(res["per_task"]) == {0, 1}


def test_step_timer():
    from schemanet_tpu.utils.profiling import StepTimer

    t = StepTimer(window=3)
    assert t.step(4) is None  # first call sets t0
    assert t.step(4) is None
    assert t.step(4) is None
    out = t.step(4)
    assert out is not None and out["items_per_sec"] > 0


def test_make_deterministic():
    from schemanet_tpu.utils.seed import make_deterministic

    eff = make_deterministic(42)
    a = np.random.rand(3)
    make_deterministic(42)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)
    assert eff == 42  # single process


def test_build_eval_and_adv_loaders():
    from schemanet_tpu.data.loader import build_adv_loader, build_eval_loader

    data_cfg = {"name": "synthetic", "root": "", "train": {"split": "train"},
                "val": {"split": "val"}, "resize": 16, "num_classes": 3,
                "num_samples": 20, "image_size": 16}
    val_cfg = {"batch_size": 8, "num_workers": 1}
    loader, n = build_eval_loader(data_cfg, val_cfg)
    assert n == 3
    batches = list(loader)
    assert sum(float(b["valid"].sum()) for b in batches) == 20  # drop_last=False
    adv, n2 = build_adv_loader(data_cfg, val_cfg)
    assert n2 == 3 and adv.split == "val"


def test_mid_extractor(rng):
    import jax
    import jax.numpy as jnp

    from schemanet_tpu.models.capture import MidExtractor, translate_probe_name
    from schemanet_tpu.models.vit import get_model

    assert translate_probe_name("module.transformer.layers.9") == "layers_9.out"
    assert (
        translate_probe_name("module.transformer.layers.9.attention.attn_raw_identity")
        == "layers_9.attn_raw"
    )
    assert translate_probe_name("layers_3") == "layers_3.out"

    cfg = {
        "name": "vit",
        "transformer": dict(embed_dim=16, num_encoder_layers=2, num_heads=2,
                            dim_feedforward=32, dropout=None, activation="gelu",
                            final_norm=True, norm_eps=1e-6),
        "patch_embed": dict(img_size=16, patch_size=8, image_channels=3),
        "pos_encoding": dict(name="learnable"),
    }
    model = get_model(cfg, 4)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    extractor = MidExtractor(model, params, ["module.transformer.layers.1"])
    feats = extractor(x)
    assert feats["module.transformer.layers.1"].shape == (2, 5, 16)
