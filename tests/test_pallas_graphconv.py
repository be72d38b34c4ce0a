"""Fused Pallas GraphConv (ops/pallas/graphconv.py) vs the XLA `_sym_conv`.

Interpret mode on CPU; fp32 pins exact-semantics parity (both paths
accumulate matmuls in fp32 and symmetrise in the input dtype), bf16 checks
the training configuration to rounding tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from schemanet_tpu.ops.pallas.graphconv import sym_conv
from schemanet_tpu.schema.gnn import _sym_conv


@pytest.fixture
def rng():
    return np.random.default_rng(3)


@pytest.mark.parametrize("k,v,d", [(4, 16, 32), (3, 100, 48), (2, 500, 64)])
def test_fwd_bwd_parity_fp32(rng, k, v, d):
    e = jnp.asarray(rng.normal(size=(k, v, v)).astype(np.float32))
    f = jnp.asarray(rng.normal(size=(k, v, d)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(k, v, d)).astype(np.float32))

    out_p = sym_conv(e, f, True)
    out_x = _sym_conv(e, f)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), rtol=1e-4, atol=1e-4)

    def loss(fn):
        return lambda e_, f_: jnp.vdot(fn(e_, f_), g)

    de_p, df_p = jax.grad(lambda e_, f_: jnp.vdot(sym_conv(e_, f_, True), g), (0, 1))(e, f)
    de_x, df_x = jax.grad(loss(_sym_conv), (0, 1))(e, f)
    np.testing.assert_allclose(np.asarray(df_p), np.asarray(df_x), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(de_p), np.asarray(de_x), rtol=1e-4, atol=1e-4)


def test_fwd_bwd_parity_bf16(rng):
    k, v, d = 3, 64, 32
    e = jnp.asarray(rng.normal(size=(k, v, v)).astype(np.float32), jnp.bfloat16)
    f = jnp.asarray(rng.normal(size=(k, v, d)).astype(np.float32), jnp.bfloat16)
    g = jnp.asarray(rng.normal(size=(k, v, d)).astype(np.float32), jnp.bfloat16)

    out_p = np.asarray(sym_conv(e, f, True)).astype(np.float32)
    out_x = np.asarray(_sym_conv(e, f)).astype(np.float32)
    np.testing.assert_allclose(out_p, out_x, rtol=2e-2, atol=6e-2)

    de_p, df_p = jax.grad(
        lambda e_, f_: jnp.vdot(sym_conv(e_, f_, True), g).astype(jnp.float32), (0, 1)
    )(e, f)
    de_x, df_x = jax.grad(
        lambda e_, f_: jnp.vdot(_sym_conv(e_, f_), g).astype(jnp.float32), (0, 1)
    )(e, f)
    np.testing.assert_allclose(
        np.asarray(df_p).astype(np.float32), np.asarray(df_x).astype(np.float32),
        rtol=2e-2, atol=6e-2,
    )
    np.testing.assert_allclose(
        np.asarray(de_p).astype(np.float32), np.asarray(de_x).astype(np.float32),
        rtol=2e-2, atol=6e-2,
    )


def test_shape_gate():
    """The dispatch gate admits ImageNet class graphs, rejects per-program-
    overhead-bound instance graphs and VMEM-overflowing CIFAR class graphs."""
    from schemanet_tpu.ops.pallas.graphconv import shape_fits_kernel

    assert shape_fits_kernel(500, 1024, 2)       # ImageNet class graphs
    assert not shape_fits_kernel(196, 1024, 2)   # instance graphs (overhead)
    assert not shape_fits_kernel(1024, 256, 2)   # CIFAR class graphs (VMEM)


def test_graphconv_module_dispatch(rng, monkeypatch):
    """GraphConv routes through the fused kernel when the env selects it
    (gate forced open for the toy shape), with identical params and (fp32)
    identical outputs/grads."""
    import schemanet_tpu.ops.pallas.graphconv as gc
    from schemanet_tpu.schema.gnn import GraphConv

    k, v, d = 3, 24, 16
    e = jnp.asarray(rng.normal(size=(k, v, v)).astype(np.float32))
    f = jnp.asarray(rng.normal(size=(k, v, d)).astype(np.float32))

    mod = GraphConv(out_dim=d)
    params = mod.init(jax.random.PRNGKey(0), e, f)["params"]

    monkeypatch.setattr(gc, "shape_fits_kernel", lambda *a, **kw: True)
    monkeypatch.delenv("SCHEMANET_GRAPHCONV_BACKEND", raising=False)
    out_x = mod.apply({"params": params}, e, f)
    g_x = jax.grad(lambda p: (mod.apply({"params": p}, e, f) ** 2).sum())(params)

    monkeypatch.setenv("SCHEMANET_GRAPHCONV_BACKEND", "interpret")
    out_p = mod.apply({"params": params}, e, f)
    g_p = jax.grad(lambda p: (mod.apply({"params": p}, e, f) ** 2).sum())(params)

    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), rtol=1e-4, atol=1e-4)
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_x), jax.tree_util.tree_leaves_with_path(g_p)
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-5,
            err_msg=jax.tree_util.keystr(kp),
        )


def test_tpu_lowering_at_atlas_scale():
    """The kernel must lower to Mosaic at the real ImageNet atlas shape
    ([1000, 500, 500] x [1000, 500, 1024]) — catches unsupported-op errors
    (e.g. the in-kernel transpose) without a chip."""
    e = jnp.zeros((1000, 500, 500), jnp.bfloat16)
    f = jnp.zeros((1000, 500, 1024), jnp.bfloat16)

    def fwd_bwd(e_, f_):
        return jax.grad(lambda a, b: jnp.sum(sym_conv(a, b, False)), (0, 1))(e_, f_)

    jax.jit(fwd_bwd).trace(e, f).lower(lowering_platforms=("tpu",))
