"""Serving path: microbatched predict, attribution maps, graph export."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from schemanet_tpu.serve import ServePredictor
from tests.test_predictor import K, M, make_predictor


@pytest.fixture(scope="module")
def server():
    predictor = make_predictor()
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = predictor.init(jax.random.PRNGKey(0), x, method="init_full")
    return ServePredictor(
        predictor, variables["params"], variables["buffers"], microbatch=4
    )


def test_predict_microbatching(server, rng):
    images = rng.normal(size=(10, 32, 32, 3)).astype(np.float32)
    logits = server.predict(images)
    assert logits.shape == (10, K)
    # microbatched result equals per-sample result (padding doesn't leak)
    one = server.predict(images[3:4])
    np.testing.assert_allclose(logits[3], one[0], rtol=1e-4, atol=1e-5)


def test_serve_matches_reference_bs1_with_nonzero_fc_bias(rng):
    # serve pools with each sample's OWN live-slot count — exactly the
    # reference's bs=1 semantics (batch max == own count). Verified with a
    # NONZERO GNN fc bias: the pooled vector passes through the fc Dense, so a
    # static-denominator rescale would NOT preserve logits/argmax (fc(s/d)+b is
    # not a scalar multiple of fc(s/d')+b), but per-sample pooling is exact.
    import flax

    predictor = make_predictor()
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = predictor.init(jax.random.PRNGKey(0), x, method="init_full")
    params = flax.core.unfreeze(variables["params"])
    fc = params["matcher"]["gnn"]["fc"]
    fc["bias"] = jax.random.normal(jax.random.PRNGKey(7), fc["bias"].shape)
    server = ServePredictor(predictor, params, variables["buffers"], microbatch=4)

    images = rng.normal(size=(6, 32, 32, 3)).astype(np.float32)
    got = server.predict(images)
    for i in range(len(images)):
        ref_bs1 = server.predictor.apply(
            {"params": params, "buffers": variables["buffers"]},
            jnp.asarray(images[i : i + 1]),
        )["pred"]
        np.testing.assert_allclose(got[i], np.asarray(ref_bs1)[0], rtol=1e-4, atol=1e-5)


def test_explain_attribution(server, rng):
    images = rng.normal(size=(3, 32, 32, 3)).astype(np.float32)
    res = server.explain(images)
    assert res["attribution"].shape == (3, K, 4, 4)
    assert res["ingredients"].shape == (3, 4, 4)
    # attribution of token t for class k equals the atlas vertex weight of its
    # code when present in class k
    atlas_v = np.asarray(
        server.predictor.apply(
            {"params": server.params, "buffers": server.buffers},
            method=lambda m: m.schema_net.get_atlas(),
        )["class_vertices"]
    )
    class_ing = np.asarray(server.buffers["schema_net"]["class_ingredients"])
    b, k = 0, 2
    code = int(res["ingredients"][b, 0, 0])
    slots = np.where(class_ing[k] == code)[0]
    want = float(atlas_v[k, slots[0]]) if len(slots) else 0.0
    np.testing.assert_allclose(res["attribution"][b, k, 0, 0], want, rtol=1e-5)


def test_explain_networkx(server, rng):
    pytest.importorskip("networkx")
    images = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    g = server.explain_networkx(images, sample=0, node_topk=5, edge_topk=3)
    assert all(node < M for node in g.nodes)
    assert len(g.nodes) <= 5


def test_serve_quant_int8_close(server, rng):
    # W8A8 frozen-backbone serving (quant_int8=True): logits track the fp32
    # server closely; this is the off-chip drift gate for the PTQ serve path
    # (ops/quant.py; real-weight accuracy gating happens on hardware).
    images = rng.normal(size=(6, 32, 32, 3)).astype(np.float32)
    qserver = ServePredictor(
        server.predictor, server.params, server.buffers, microbatch=4, quant_int8=True
    )
    ref = server.predict(images)
    got = qserver.predict(images)
    assert got.shape == ref.shape
    rel = np.linalg.norm(got - ref) / max(np.linalg.norm(ref), 1e-9)
    assert rel < 0.06, rel
