"""Static class-ingredient embedding backward (schema/gnn.py StaticIds).

The class-graph code-id buffer is written once by atlas init (reference
scripts/init_schema_net.py:19-65) and never updated during training, so the
trainer declares it static to the jitted step; the embedding backward then
becomes a trace-time-sorted banded one-hot reduction instead of a dynamic
scatter-add. These tests pin that path to the dynamic one (the parity-tested
reference semantics) in value and gradient, across both backward modes and
the band-clamping edge cases.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from schemanet_tpu.schema.gnn import (
    Matcher,
    StaticIds,
    _embed_lookup,
    _embed_lookup_static,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _grad_pair(table, ids, cotangent):
    """(dynamic, static) gradients wrt the table for the same cotangent."""
    sids = StaticIds(ids)

    def dyn(t):
        return (_embed_lookup(t, jnp.asarray(ids)) * cotangent).sum()

    def stat(t):
        return (_embed_lookup_static(t, sids) * cotangent).sum()

    return jax.grad(dyn)(table), jax.grad(stat)(table)


@pytest.mark.parametrize("mode", ["blocked", "sorted_scatter"])
@pytest.mark.parametrize(
    "num_rows,shape,hi",
    [
        (64, (5, 9), 64),        # num_rows < 128: W clamps to num_rows
        (513, (16, 40), 513),    # uniform ids over a mid-size vocab
        (2048, (12, 50), 40),    # duplicate-heavy: all ids in a narrow band
        (4096, (8, 64), 4096),   # ids near the top: lo clamps to num_rows - W
    ],
)
def test_static_matches_dynamic_grad(rng, monkeypatch, mode, num_rows, shape, hi):
    monkeypatch.setenv("SCHEMANET_STATIC_EMBED_BWD", mode)
    D = 48
    ids = rng.integers(0, hi, size=shape).astype(np.int32)
    if hi == 4096:  # push ids into the top band to exercise the lo clamp
        ids = np.maximum(ids, num_rows - 100).astype(np.int32)
    table = jnp.asarray(rng.normal(size=(num_rows, D)).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=shape + (D,)).astype(np.float32))

    out_dyn = _embed_lookup(table, jnp.asarray(ids))
    out_stat = _embed_lookup_static(table, StaticIds(ids))
    np.testing.assert_array_equal(np.asarray(out_dyn), np.asarray(out_stat))

    g_dyn, g_stat = _grad_pair(table, ids, ct)
    # both paths accumulate in fp32 but tile the contraction differently;
    # summation-order noise only
    np.testing.assert_allclose(
        np.asarray(g_stat), np.asarray(g_dyn), rtol=1e-5, atol=2e-5
    )


def test_static_grad_multichunk(rng, monkeypatch):
    """More rows than one chunk: force tiny chunks via many duplicate ids so
    the blocked path crosses chunk boundaries with overlapping bands."""
    monkeypatch.setenv("SCHEMANET_STATIC_EMBED_BWD", "blocked")
    import schemanet_tpu.schema.gnn as gnn_mod

    num_rows, D = 300, 16
    ids = rng.integers(0, num_rows, size=(120, 90)).astype(np.int32)  # 10800 rows
    table = jnp.asarray(rng.normal(size=(num_rows, D)).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=ids.shape + (D,)).astype(np.float32))
    g_dyn, g_stat = _grad_pair(table, ids, ct)
    np.testing.assert_allclose(
        np.asarray(g_stat), np.asarray(g_dyn), rtol=1e-5, atol=1e-5
    )


def test_static_grad_bf16_accumulates_fp32(rng, monkeypatch):
    """bf16 cotangents with hot duplicate ids: the banded reduction must
    accumulate in fp32 (like both dynamic branches), not in bf16."""
    monkeypatch.setenv("SCHEMANET_STATIC_EMBED_BWD", "blocked")
    num_rows, D = 64, 32
    # 4096 contributions onto 4 ids: bf16 accumulation would lose ~all of the
    # small addends past the first few hundred
    ids = np.repeat(np.arange(4, dtype=np.int32), 1024).reshape(64, 64)
    g = rng.normal(size=(64, 64, D)).astype(np.float32)
    table = jnp.zeros((num_rows, D), jnp.bfloat16)

    def f(t):
        return (_embed_lookup_static(t, StaticIds(ids)) * jnp.asarray(g, jnp.bfloat16)).sum(
            dtype=jnp.float32
        )

    got = np.asarray(jax.grad(f)(table)).astype(np.float32)
    want = np.zeros((num_rows, D), np.float32)  # fp32 oracle of the scatter-add
    np.add.at(want, ids.reshape(-1), g.astype(jnp.bfloat16).astype(np.float32).reshape(-1, D))
    # fp32-accumulated sums of ~1000 unit-scale terms agree to ~1% (the only
    # rounding left is the final cast back to bf16); a bf16 accumulator would
    # be off by >10% here
    rel = np.abs(got[:4] - want[:4]) / np.maximum(np.abs(want[:4]), 1e-2)
    assert rel.max() < 2e-2, rel.max()
    assert np.all(got[4:] == 0)


def test_matcher_static_ids_end_to_end(rng):
    """Full Matcher: static_class_ids on vs off gives identical logits and
    matching gradients wrt every param (embedding included)."""
    M, DIM, K, V, BS, L = 50, 32, 7, 12, 4, 10
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

    kw = dict(similarity="inner_product", num_codes=M, embed_dim=DIM, num_layers=2)
    dyn = Matcher(**kw)
    stat = Matcher(**kw, static_class_ids=StaticIds(ci))
    params = dyn.init(jax.random.PRNGKey(0), instance, atlas)["params"]

    out_dyn = dyn.apply({"params": params}, instance, atlas)
    out_stat = stat.apply({"params": params}, instance, atlas)
    np.testing.assert_array_equal(np.asarray(out_dyn), np.asarray(out_stat))

    def loss(m):
        def f(p):
            return (m.apply({"params": p}, instance, atlas) ** 2).sum()

        return f

    g_dyn = jax.grad(loss(dyn))(params)
    g_stat = jax.grad(loss(stat))(params)
    flat_d, _ = jax.tree_util.tree_flatten_with_path(g_dyn)
    flat_s, _ = jax.tree_util.tree_flatten_with_path(g_stat)
    for (path, a), (_, b) in zip(flat_d, flat_s):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-6,
            err_msg=jax.tree_util.keystr(path),
        )


def test_static_ids_shape_mismatch_asserts(rng):
    """Declaring static ids of the wrong shape must fail loudly at trace."""
    M, DIM, K, V = 20, 16, 3, 5
    ci = rng.integers(0, M, size=(K, V)).astype(np.int32)
    atlas = {
        "class_vertices": jnp.ones((K, V), jnp.float32),
        "class_edges": jnp.ones((K, V, V), jnp.float32),
        "class_ingredients": jnp.asarray(ci),
    }
    instance = {
        "instance_vertices": jnp.ones((2, 4), jnp.float32),
        "instance_edges": jnp.ones((2, 4, 4), jnp.float32),
        "instance_ingredients": jnp.zeros((2, 4), jnp.int32),
        "num_slots": jnp.full((2,), 4, jnp.int32),
    }
    bad = Matcher(
        similarity="inner_product", num_codes=M, embed_dim=DIM, num_layers=1,
        static_class_ids=StaticIds(ci[:, :-1]),
    )
    params = Matcher(
        similarity="inner_product", num_codes=M, embed_dim=DIM, num_layers=1
    ).init(jax.random.PRNGKey(0), instance, atlas)["params"]
    with pytest.raises(AssertionError):
        bad.apply({"params": params}, instance, atlas)


def test_staticids_hash_equality():
    a = StaticIds(np.arange(6).reshape(2, 3))
    b = StaticIds(np.arange(6).reshape(2, 3))
    c = StaticIds(np.arange(6).reshape(3, 2))
    assert a == b and hash(a) == hash(b)
    assert a != c
