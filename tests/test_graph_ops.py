"""Golden tests: dense TPU graph ops vs the literal numpy oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from schemanet_tpu import ops
from tests import oracle


BS, L, V = 4, 24, 16  # small L so the O(L^2 * C^2) oracle stays fast
H = W = None


def make_inputs(rng, bs=BS, length=L, vocab=V):
    ingredients = rng.integers(0, vocab, size=(bs, length)).astype(np.int32)
    attn_cls = rng.normal(size=(bs, length)).astype(np.float32)
    attn = rng.normal(size=(bs, length, length)).astype(np.float32)
    w_v = rng.uniform(0.1, 1.0, size=(2, 1)).astype(np.float32)
    w_e = rng.uniform(0.1, 1.0, size=(2, 1)).astype(np.float32)
    return ingredients, attn_cls, attn, w_v, w_e


def test_pairwise_point_sim(rng):
    got = np.asarray(ops.pairwise_point_sim(4, 6, alpha=1.5, pow=2))
    want = oracle.pairwise_point_sim_oracle(4, 6, alpha=1.5, pow=2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("clamp", [None, -1.0, 0.1])
def test_full_vertices(rng, clamp):
    ingredients, attn_cls, _, w_v, _ = make_inputs(rng)
    got = np.asarray(
        ops.feat_to_full_vertices(
            jnp.asarray(ingredients), jnp.asarray(attn_cls), V, jnp.asarray(w_v), clamp
        )
    )
    want = oracle.feat_to_full_vertices_oracle(ingredients, attn_cls, V, w_v, clamp)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_vertex_attributes_counts(rng):
    ingredients, attn_cls, _, _, _ = make_inputs(rng)
    sm = oracle.clamp_softmax_np(attn_cls, None)
    got = np.asarray(
        ops.vertex_attributes_full(jnp.asarray(ingredients), jnp.asarray(sm.astype(np.float32)), V)
    )
    want = oracle.feat_to_v_attr_oracle(ingredients, sm, V, mean=True)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("clamp", [None, -1.0])
def test_instance_vertices(rng, clamp):
    ingredients, attn_cls, _, w_v, _ = make_inputs(rng)
    slots = ops.compact_instance_slots(jnp.asarray(ingredients), num_codes=V)
    got = np.asarray(
        ops.instance_vertices(slots, jnp.asarray(attn_cls), jnp.asarray(w_v), clamp)
    )
    codes_ref, weights_ref = oracle.feat_to_instance_v_oracle(
        ingredients, attn_cls, w_v, clamp
    )
    n_slots = np.asarray(slots.num_slots)
    codes = np.asarray(slots.codes)
    for b in range(BS):
        n = int(n_slots[b])
        assert n == len(codes_ref[b])
        np.testing.assert_array_equal(codes[b, :n], codes_ref[b])
        assert np.all(codes[b, n:] == V)  # dummy padding id
        np.testing.assert_allclose(got[b, :n], weights_ref[b], rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(got[b, n:], 0.0)


@pytest.mark.parametrize("clamp,self_loop", [(None, False), (-1.0, True)])
def test_instance_edges(rng, clamp, self_loop):
    ingredients, _, attn, _, w_e = make_inputs(rng)
    geo = oracle.pairwise_point_sim_oracle(4, 6).astype(np.float32)
    slots = ops.compact_instance_slots(jnp.asarray(ingredients), num_codes=V)
    got = np.asarray(
        ops.instance_edges(
            slots, jnp.asarray(attn), jnp.asarray(geo), jnp.asarray(w_e),
            clamp_edge_attn=clamp, remove_self_loop=self_loop,
        )
    )
    want = oracle.feat_to_instance_e_oracle(
        ingredients, attn, geo, w_e, clamp, remove_self_loop=self_loop
    )
    n_slots = np.asarray(slots.num_slots)
    for b in range(BS):
        n = int(n_slots[b])
        np.testing.assert_allclose(got[b, :n, :n], want[b], rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(got[b, n:, :], 0.0)
        np.testing.assert_allclose(got[b, :, n:], 0.0)


@pytest.mark.parametrize("self_loop", [False, True])
def test_class_limited_edges(rng, self_loop):
    ingredients, _, attn, _, w_e = make_inputs(rng)
    geo = oracle.pairwise_point_sim_oracle(4, 6).astype(np.float32)
    K, v_max = 3, 6
    # distinct codes per class row (mimics topk output)
    class_ing = np.stack([rng.permutation(V)[:v_max] for _ in range(K)]).astype(np.int32)
    labels = rng.integers(0, K, size=(BS,)).astype(np.int32)
    got = np.asarray(
        ops.class_limited_edges(
            jnp.asarray(ingredients), jnp.asarray(attn), jnp.asarray(geo),
            jnp.asarray(labels), jnp.asarray(class_ing), jnp.asarray(w_e),
            clamp_edge_attn=None, remove_self_loop=self_loop,
        )
    )
    want = oracle.feat_to_e_oracle(
        ingredients, attn, geo, labels, class_ing, w_e, None, remove_self_loop=self_loop
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_vq_matches_bruteforce(rng):
    x = rng.normal(size=(50, 8)).astype(np.float32)
    cb = rng.normal(size=(12, 8)).astype(np.float32)
    ids = np.asarray(ops.vq_assign(jnp.asarray(x), jnp.asarray(cb)))
    d = ((x[:, None, :] - cb[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(ids, d.argmin(1))


def test_vq_encode_quantize_toggle(rng):
    x = rng.normal(size=(5, 3, 8)).astype(np.float32)
    cb = rng.normal(size=(12, 8)).astype(np.float32)
    q, ids = ops.vq_encode(jnp.asarray(x), jnp.asarray(cb), quantize=True)
    np.testing.assert_allclose(np.asarray(q), cb[np.asarray(ids)], rtol=1e-6)
    orig, ids2 = ops.vq_encode(jnp.asarray(x), jnp.asarray(cb), quantize=False)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids2))
    np.testing.assert_allclose(np.asarray(orig), x)


def test_kmeans_recovers_separated_clusters(rng):
    import jax

    true_centers = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0], [10.0, 10.0]], np.float32)
    data = np.concatenate(
        [rng.normal(scale=0.2, size=(200, 2)).astype(np.float32) + c for c in true_centers]
    )
    rng.shuffle(data)
    batches = [data[i : i + 128] for i in range(0, len(data), 128)]
    centers = ops.fit_kmeans(
        jax.random.PRNGKey(0), batches, 4, lloyd_iters=5, lloyd_data=data
    )
    centers = np.sort(np.asarray(centers), axis=0)
    want = np.sort(true_centers, axis=0)
    np.testing.assert_allclose(centers, want, atol=0.3)


def test_normalize_sum_detach_grad():
    import jax

    x = jnp.array([1.0, 3.0])

    def f_detach(x):
        return ops.normalize_sum(x, detach_sum=True)[0]

    def f_full(x):
        return ops.normalize_sum(x, detach_sum=False)[0]

    g_detach = jax.grad(f_detach)(x)
    g_full = jax.grad(f_full)(x)
    np.testing.assert_allclose(np.asarray(g_detach), [0.25, 0.0], atol=1e-6)
    assert not np.allclose(np.asarray(g_full), [0.25, 0.0])


def test_normalize_zero_rows_to_zero():
    x = jnp.zeros((2, 3))
    np.testing.assert_allclose(np.asarray(ops.normalize_sum(x)), 0.0)
    np.testing.assert_allclose(np.asarray(ops.normalize_max(x)), 0.0)
