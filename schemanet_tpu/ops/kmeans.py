"""On-device minibatch k-means for codebook ("ingredient") construction.

Replaces sklearn ``MiniBatchKMeans(batch_size=1024)`` / scipy kmeans in the
reference's ingredient extraction (``scripts/extract_ingredients.py:28-56``).
The whole stage becomes jitted TPU programs: assignment is the same MXU matmul
as :mod:`schemanet_tpu.ops.vq`; center updates are scatter-mean with the
standard minibatch per-center learning rate 1/n_seen (Sculley 2010, the same
update rule sklearn implements).

Also provides full-batch Lloyd iterations (``lloyd_step``) for small corpora —
deterministic and closer to scipy's kmeans for parity testing.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .vq import vq_assign


class KMeansState(NamedTuple):
    centers: jnp.ndarray  # [M, d] float32
    counts: jnp.ndarray  # [M] float32 — per-center samples seen (minibatch lr)


def kmeans_init(
    key: jax.Array, data: jnp.ndarray, num_clusters: int, plus_plus: bool = True
) -> KMeansState:
    """Initialise centers from a data sample (k-means++ D^2 sampling by default,
    like sklearn's MiniBatchKMeans; random rows otherwise)."""
    data = jnp.asarray(data, jnp.float32)
    n = data.shape[0]
    if not plus_plus or n < num_clusters:
        idx = jax.random.choice(key, n, shape=(num_clusters,), replace=n < num_clusters)
        centers = data[idx]
    else:
        centers = _kmeans_plus_plus(key, data, num_clusters)
    return KMeansState(centers=centers, counts=jnp.zeros((num_clusters,), jnp.float32))


@functools.partial(jax.jit, static_argnums=(2,))
def _kmeans_plus_plus(key: jax.Array, data: jnp.ndarray, num_clusters: int) -> jnp.ndarray:
    """Sequential D^2 seeding (Arthur & Vassilvitskii 2007) as a lax.fori_loop."""
    n, d = data.shape
    k0, key = jax.random.split(key)
    first = data[jax.random.randint(k0, (), 0, n)]
    centers0 = jnp.zeros((num_clusters, d), jnp.float32).at[0].set(first)
    d2_0 = jnp.sum((data - first[None, :]) ** 2, axis=-1)

    def body(i, carry):
        centers, d2, key = carry
        key, sub = jax.random.split(key)
        probs = d2 / jnp.maximum(d2.sum(), 1e-12)
        idx = jax.random.choice(sub, n, p=probs)
        new_center = data[idx]
        centers = centers.at[i].set(new_center)
        d2 = jnp.minimum(d2, jnp.sum((data - new_center[None, :]) ** 2, axis=-1))
        return centers, d2, key

    centers, _, _ = jax.lax.fori_loop(1, num_clusters, body, (centers0, d2_0, key))
    return centers


@functools.partial(jax.jit, donate_argnums=(0,))
def minibatch_step(state: KMeansState, batch: jnp.ndarray) -> KMeansState:
    """One minibatch update: assign, then move each center toward its batch mean
    with per-center step size 1/counts (Sculley's web-scale k-means)."""
    m = state.centers.shape[0]
    ids = vq_assign(batch, state.centers)
    # one-hot matmul instead of scatter-add (TPU scatters serialise)
    onehot = jax.nn.one_hot(ids, m, dtype=jnp.float32)  # [n, M]
    batch_counts = jnp.sum(onehot, axis=0)
    batch_sums = jnp.einsum("nm,nd->md", onehot, batch.astype(jnp.float32))
    new_counts = state.counts + batch_counts
    # per-sample running-mean update aggregated per batch:
    # c <- c + (sum_batch - n_batch * c) / new_count   (exact for batch lr 1/n)
    delta = batch_sums - batch_counts[:, None] * state.centers
    centers = state.centers + jnp.where(
        new_counts[:, None] > 0, delta / jnp.maximum(new_counts, 1.0)[:, None], 0.0
    )
    return KMeansState(centers=centers, counts=new_counts)


@jax.jit
def lloyd_step(centers: jnp.ndarray, data: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One full-batch Lloyd iteration; empty clusters keep their center.

    Returns (new_centers, mean squared distance)."""
    m = centers.shape[0]
    ids = vq_assign(data, centers)
    onehot = jax.nn.one_hot(ids, m, dtype=jnp.float32)  # [n, M]
    counts = jnp.sum(onehot, axis=0)
    sums = jnp.einsum("nm,nd->md", onehot, data.astype(jnp.float32))
    new_centers = jnp.where(
        counts[:, None] > 0, sums / jnp.maximum(counts, 1.0)[:, None], centers
    )
    assigned = jnp.take(new_centers, ids, axis=0)
    inertia = jnp.mean(jnp.sum((data.astype(jnp.float32) - assigned) ** 2, axis=-1))
    return new_centers, inertia


def fit_kmeans(
    key: jax.Array,
    data_iter,
    num_clusters: int,
    init_data: Optional[jnp.ndarray] = None,
    lloyd_iters: int = 0,
    lloyd_data: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Stream minibatches through minibatch k-means; optional Lloyd refinement.

    ``data_iter`` yields [n, d] arrays (host or device). Features are never
    materialised to disk unless the caller wants to (contrast with the
    reference's mandatory ``saved_features.h5``).
    """
    state = None
    for batch in data_iter:
        batch = jnp.asarray(batch)
        if state is None:
            if init_data is None:
                init_data = batch
            state = kmeans_init(key, init_data, num_clusters)
        state = minibatch_step(state, batch)
    if state is None:
        raise ValueError("empty data iterator")
    centers = state.centers
    if lloyd_iters and lloyd_data is not None:
        for _ in range(lloyd_iters):
            centers, _ = lloyd_step(centers, jnp.asarray(lloyd_data))
    return centers
