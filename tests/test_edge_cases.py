"""Degenerate-input robustness for the graph ops + k-means quality vs sklearn."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from schemanet_tpu import ops
from tests import oracle


def test_all_same_code_sample(rng):
    """A sample whose every token maps to ONE code: n_i = 1 graphs."""
    bs, L, V = 2, 8, 6
    ingredients = np.full((bs, L), 3, np.int32)
    attn_cls = rng.normal(size=(bs, L)).astype(np.float32)
    attn = rng.normal(size=(bs, L, L)).astype(np.float32)
    geo = oracle.pairwise_point_sim_oracle(2, 4).astype(np.float32)
    w = np.full((2, 1), 0.5, np.float32)

    slots = ops.compact_instance_slots(jnp.asarray(ingredients), V)
    assert np.asarray(slots.num_slots).tolist() == [1, 1]
    assert np.asarray(slots.codes)[:, 0].tolist() == [3, 3]
    assert np.all(np.asarray(slots.codes)[:, 1:] == V)

    verts = np.asarray(ops.instance_vertices(slots, jnp.asarray(attn_cls), jnp.asarray(w)))
    _, want_w = oracle.feat_to_instance_v_oracle(ingredients, attn_cls, w)
    np.testing.assert_allclose(verts[:, 0], [w[0] for w in want_w], rtol=1e-4)
    np.testing.assert_allclose(verts[:, 1:], 0.0)

    edges = np.asarray(
        ops.instance_edges(slots, jnp.asarray(attn), jnp.asarray(geo), jnp.asarray(w))
    )
    want_e = oracle.feat_to_instance_e_oracle(ingredients, attn, geo, w)
    np.testing.assert_allclose(edges[0, :1, :1], want_e[0], rtol=1e-4)


def test_self_loop_removal_single_vertex(rng):
    """remove_self_loop on an n=1 graph zeroes the only entry (like the ref)."""
    ingredients = np.zeros((1, 4), np.int32)
    attn = rng.normal(size=(1, 4, 4)).astype(np.float32)
    geo = oracle.pairwise_point_sim_oracle(2, 2).astype(np.float32)
    w = np.full((2, 1), 0.5, np.float32)
    slots = ops.compact_instance_slots(jnp.asarray(ingredients), 4)
    edges = np.asarray(
        ops.instance_edges(
            slots, jnp.asarray(attn), jnp.asarray(geo), jnp.asarray(w),
            remove_self_loop=True,
        )
    )
    np.testing.assert_allclose(edges, 0.0)


def test_length_one_sequence(rng):
    ingredients = np.array([[2]], np.int32)
    attn_cls = np.array([[0.7]], np.float32)
    full = np.asarray(
        ops.feat_to_full_vertices(
            jnp.asarray(ingredients), jnp.asarray(attn_cls), 5,
            jnp.asarray(np.full((2, 1), 0.5, np.float32)),
        )
    )
    # count=1 normalised to 1, attn softmax of single element = 1 -> weight 1.0
    np.testing.assert_allclose(full[0, 2], 1.0, rtol=1e-5)
    assert np.count_nonzero(full) == 1


def test_class_limited_edges_no_overlap(rng):
    """Samples whose codes don't intersect their class's vertex set -> zeros."""
    ingredients = np.full((2, 6), 9, np.int32)
    attn = rng.normal(size=(2, 6, 6)).astype(np.float32)
    geo = oracle.pairwise_point_sim_oracle(2, 3).astype(np.float32)
    class_ing = np.array([[0, 1, 2]], np.int32)  # code 9 absent
    labels = np.zeros((2,), np.int32)
    got = np.asarray(
        ops.class_limited_edges(
            jnp.asarray(ingredients), jnp.asarray(attn), jnp.asarray(geo),
            jnp.asarray(labels), jnp.asarray(class_ing),
            jnp.asarray(np.full((2, 1), 0.5, np.float32)), None,
        )
    )
    np.testing.assert_allclose(got, 0.0)


def test_kmeans_quality_vs_sklearn(rng):
    """Our minibatch k-means + Lloyd reaches sklearn-class inertia."""
    sklearn_cluster = pytest.importorskip("sklearn.cluster")
    data = np.concatenate(
        [rng.normal(loc=c, scale=0.5, size=(300, 8)).astype(np.float32)
         for c in np.linspace(-4, 4, 6)]
    )
    rng.shuffle(data)
    k = 6

    sk = sklearn_cluster.MiniBatchKMeans(
        n_clusters=k, batch_size=1024, n_init="auto", random_state=0,
        compute_labels=False,
    ).fit(data)

    def inertia(centers):
        d = ((data[:, None, :] - centers[None]) ** 2).sum(-1)
        return d.min(1).sum()

    batches = [data[i : i + 256] for i in range(0, len(data), 256)]
    ours = np.asarray(
        ops.fit_kmeans(jax.random.PRNGKey(0), batches, k, lloyd_iters=10, lloyd_data=data)
    )
    assert inertia(ours) <= 1.1 * inertia(sk.cluster_centers_)
