"""Pallas VQ kernel vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from schemanet_tpu.ops.pallas.vq import vq_assign_pallas
from schemanet_tpu.ops.vq import vq_assign


@pytest.mark.parametrize("n,m,d", [(100, 64, 32), (257, 130, 16)])
def test_pallas_vq_matches_xla(rng, n, m, d):
    x = rng.normal(size=(n, d)).astype(np.float32)
    cb = rng.normal(size=(m, d)).astype(np.float32)
    want = np.asarray(vq_assign(jnp.asarray(x), jnp.asarray(cb)))
    got = np.asarray(
        vq_assign_pallas(jnp.asarray(x), jnp.asarray(cb), tile_n=64, tile_m=64, interpret=True)
    )
    np.testing.assert_array_equal(got, want)


def test_pallas_vq_tie_break_first(rng):
    # duplicate codes: first occurrence must win (torch argmin semantics)
    cb = rng.normal(size=(16, 8)).astype(np.float32)
    cb[9] = cb[2]
    x = cb[np.array([2, 9, 2])] + 0.0
    got = np.asarray(
        vq_assign_pallas(jnp.asarray(x), jnp.asarray(cb), tile_n=8, tile_m=8, interpret=True)
    )
    np.testing.assert_array_equal(got, [2, 2, 2])


def test_pallas_vq_leading_shape(rng):
    x = rng.normal(size=(4, 7, 16)).astype(np.float32)
    cb = rng.normal(size=(32, 16)).astype(np.float32)
    got = vq_assign_pallas(jnp.asarray(x), jnp.asarray(cb), tile_n=8, tile_m=16, interpret=True)
    assert got.shape == (4, 7)
    want = vq_assign(jnp.asarray(x), jnp.asarray(cb))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
