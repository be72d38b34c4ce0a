"""VMEM-histogram embedding backward (ops/pallas/embed_bwd.py) vs the
fp32 scatter-add it replaces.

Interpret mode on CPU. The kernel's contract is exact fp32 accumulation in
serial row order — identical semantics to `.at[ids].add(g.astype(f32))` up
to floating-point reassociation across D-blocks (none: each output element
is a single serial sum over its rows), so fp32 parity is exact-tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from schemanet_tpu.ops.pallas.embed_bwd import embed_grad, shape_fits_kernel


def _scatter_ref(ids, g, num_rows):
    return (
        jnp.zeros((num_rows, g.shape[-1]), jnp.float32)
        .at[ids.reshape(-1)]
        .add(g.reshape(-1, g.shape[-1]).astype(jnp.float32))
    )


@pytest.fixture
def rng():
    return np.random.default_rng(11)


@pytest.mark.parametrize("ilp", [1, 2])
@pytest.mark.parametrize(
    "rows,num_rows,d",
    [(700, 129, 128), (4096, 1025, 256), (5000, 257, 128)],  # incl. pad path
)
def test_parity_fp32(rng, rows, num_rows, d, ilp):
    ids = jnp.asarray(rng.integers(0, num_rows, size=rows).astype(np.int32))
    g = jnp.asarray(rng.normal(size=(rows, d)).astype(np.float32))
    out = embed_grad(ids, g, num_rows, True, ilp)
    ref = _scatter_ref(ids, g, num_rows)
    # ilp=1 reproduces the scatter's serial order bit-for-bit; ilp=2 sums the
    # even/odd streams separately (fp32 reassociation only)
    tol = dict(rtol=1e-6, atol=1e-6) if ilp == 1 else dict(rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), **tol)


def test_parity_bf16_cotangents(rng):
    rows, num_rows, d = 3000, 513, 256
    ids = jnp.asarray(rng.integers(0, num_rows, size=rows).astype(np.int32))
    g = jnp.asarray(rng.normal(size=(rows, d)).astype(np.float32), jnp.bfloat16)
    out = embed_grad(ids, g, num_rows, True)
    ref = _scatter_ref(ids, g, num_rows)
    # both accumulate the bf16 rows in fp32 — identical sums
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("ilp", [1, 2])
def test_duplicate_heavy_ids(rng, ilp):
    # ImageNet-like skew: most rows hit a handful of hot codes; for ilp=2 the
    # hot rows split across both accumulators and must still sum exactly
    rows, num_rows, d = 2048, 1025, 128
    ids = np.where(
        rng.random(rows) < 0.8, rng.integers(0, 4, size=rows), rng.integers(0, num_rows, size=rows)
    ).astype(np.int32)
    g = jnp.asarray(rng.normal(size=(rows, d)).astype(np.float32))
    out = embed_grad(jnp.asarray(ids), g, num_rows, True, ilp)
    ref = _scatter_ref(jnp.asarray(ids), g, num_rows)
    tol = dict(rtol=1e-6, atol=1e-6) if ilp == 1 else dict(rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), **tol)


def test_multi_d_block(rng):
    # d wide enough to need several feature blocks at this table height
    rows, num_rows, d = 1024, 4097, 1024
    assert shape_fits_kernel(rows, num_rows, d)
    ids = jnp.asarray(rng.integers(0, num_rows, size=rows).astype(np.int32))
    g = jnp.asarray(rng.normal(size=(rows, d)).astype(np.float32))
    out = embed_grad(ids, g, num_rows, True)
    ref = _scatter_ref(ids, g, num_rows)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6)


def test_shape_gate():
    # ImageNet instance path fits; absurd table heights don't
    assert shape_fits_kernel(200_000, 8001, 1024)
    assert not shape_fits_kernel(1000, 3_000_000, 1024)
    assert not shape_fits_kernel(1000, 1025, 100)  # d not 128-aligned


def test_embed_lookup_routes_through_kernel(rng, monkeypatch):
    # end-to-end: the custom-VJP lookup's big-vocabulary branch uses the
    # kernel when the policy says so, and matches the scatter branch exactly
    from schemanet_tpu.ops import policy

    num_rows, d = 1025, 128
    table = jnp.asarray(rng.normal(size=(num_rows, d)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, num_rows, size=(8, 196)).astype(np.int32))
    g = jnp.asarray(rng.normal(size=(8, 196, d)).astype(np.float32))
    # force the scatter-scale branch regardless of the small test shapes
    monkeypatch.setattr(
        "schemanet_tpu.schema.gnn._EMBED_ONEHOT_MAX_FLOPS", 0
    )

    def loss(t):
        from schemanet_tpu.schema.gnn import _embed_lookup as lk

        return jnp.vdot(lk(t, ids), g)

    monkeypatch.setenv("SCHEMANET_EMBED_BWD", "xla")
    ref = jax.grad(loss)(table)
    monkeypatch.setenv("SCHEMANET_EMBED_BWD", "interpret")
    out = jax.grad(loss)(table)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("ilp", [1, 2])
def test_mosaic_lowering(ilp):
    # off-chip Mosaic lowering gate (the trick from tests/test_pallas_mlp.py)
    ids = jnp.zeros(512, jnp.int32)
    g = jnp.zeros((512, 256), jnp.bfloat16)

    def f(ids, g):
        return embed_grad(ids, g, 1025, False, ilp)

    jax.jit(f).trace(ids, g).lower(lowering_platforms=("tpu",))
