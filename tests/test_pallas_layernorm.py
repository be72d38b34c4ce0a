"""Fused Pallas LayerNorm vs flax.linen.LayerNorm (interpret mode on CPU)."""

import numpy as np
import pytest

import flax.linen as nn
import jax
import jax.numpy as jnp

from schemanet_tpu.ops.pallas.layernorm import fused_layernorm, layernorm_backend


@pytest.mark.parametrize(
    "bs,n,d,dtype",
    [(4, 197, 192, jnp.float32), (8, 197, 192, jnp.bfloat16), (1, 5, 64, jnp.bfloat16)],
)
def test_fused_layernorm_matches_flax(rng, bs, n, d, dtype):
    x = jnp.asarray(rng.normal(size=(bs, n, d)) * 3 + 1).astype(dtype)
    scale = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    ln = nn.LayerNorm(epsilon=1e-6, dtype=dtype)
    want = ln.apply({"params": {"scale": scale, "bias": bias}}, x)
    got = fused_layernorm(x, scale, bias, 1e-6, interpret=True)
    assert got.dtype == want.dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        np.asarray(want, np.float32),
        rtol=1e-4,
        atol=1e-4 if dtype == jnp.float32 else 5e-2,
    )


def test_predictor_fused_ln_matches_xla(rng, monkeypatch):
    # end-to-end: the frozen forward with the fused LN (interpret mode)
    # produces the same logits as the plain path; note the capture layer also
    # fuses its LayerNorms (LN fusion is probe-independent, unlike attention)
    from tests.test_predictor import make_predictor

    predictor = make_predictor()
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    variables = predictor.init(jax.random.PRNGKey(0), x, method="init_full")

    monkeypatch.setenv("SCHEMANET_LN_BACKEND", "xla")
    plain = predictor.apply(variables, x, True)
    monkeypatch.setenv("SCHEMANET_LN_BACKEND", "interpret")
    fused = predictor.apply(variables, x, True)

    np.testing.assert_allclose(
        np.asarray(fused["pred"]), np.asarray(plain["pred"]), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(fused["attn_cls"]), np.asarray(plain["attn_cls"]), rtol=1e-4, atol=1e-5
    )


def test_backend_resolution(monkeypatch):
    monkeypatch.setenv("SCHEMANET_LN_BACKEND", "pallas")
    assert layernorm_backend() == "pallas"
    monkeypatch.setenv("SCHEMANET_LN_BACKEND", "auto")
    assert layernorm_backend() == "xla"  # CPU test env
    monkeypatch.delenv("SCHEMANET_LN_BACKEND")
    assert layernorm_backend() == "xla"


@pytest.mark.parametrize(
    "shape,dtype",
    [
        ((10, 64, 48), jnp.float32),   # GNN-like [K, V, D]
        ((7, 5, 33), jnp.float32),     # odd N: no sublane-multiple divisor
        ((12, 40, 64), jnp.bfloat16),
    ],
)
def test_fused_layernorm_relu_matches_flax(rng, shape, dtype):
    """act='relu' folds the GNN layers' activation into the LN pass."""
    d = shape[-1]
    x = jnp.asarray(rng.normal(size=shape) * 2).astype(dtype)
    scale = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    ln = nn.LayerNorm(epsilon=1e-6, dtype=dtype)
    want = nn.relu(ln.apply({"params": {"scale": scale, "bias": bias}}, x))
    got = fused_layernorm(x, scale, bias, 1e-6, interpret=True, act="relu")
    assert got.dtype == want.dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        np.asarray(want, np.float32),
        rtol=1e-4,
        atol=1e-4 if dtype == jnp.float32 else 5e-2,
    )


def test_fused_layernorm_relu_gradient_parity(rng):
    """dx/dscale/dbias with the in-kernel relu gate match XLA autodiff."""
    shape, d = (6, 9, 40), 40
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    sc = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    bi = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))

    def ref(x, sc, bi):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = jnp.maximum((xf * xf).mean(-1, keepdims=True) - mu * mu, 0.0)
        y = (xf - mu) * jax.lax.rsqrt(var + 1e-6) * sc + bi
        return jnp.maximum(y, 0.0).astype(x.dtype)

    g1 = jax.grad(
        lambda *a: jnp.sum(
            jnp.sin(fused_layernorm(*a, 1e-6, interpret=True, act="relu"))
        ),
        argnums=(0, 1, 2),
    )(x, sc, bi)
    g2 = jax.grad(lambda *a: jnp.sum(jnp.sin(ref(*a))), argnums=(0, 1, 2))(x, sc, bi)
    for a, b, nm in zip(g1, g2, ("x", "scale", "bias")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5, err_msg=nm
        )


def test_gnn_layer_fused_ln_matches_xla(rng, monkeypatch):
    """GNNLayer with the fused LN+relu (interpret) == plain XLA path, in
    value and in gradients wrt params, edges, and feat."""
    from schemanet_tpu.schema.gnn import GNNLayer

    K, V, D = 5, 12, 32
    edges = jnp.asarray(rng.random((K, V, V)).astype(np.float32))
    feat = jnp.asarray(rng.normal(size=(K, V, D)).astype(np.float32))
    mask = jnp.asarray(rng.random((K, V)) < 0.25)
    layer = GNNLayer(embed_dim=D, activation="relu")

    monkeypatch.setenv("SCHEMANET_LN_BACKEND", "xla")
    params = layer.init(jax.random.PRNGKey(0), edges, feat, mask)["params"]

    def loss(p, e, f, backend):
        monkeypatch.setenv("SCHEMANET_LN_BACKEND", backend)
        return (layer.apply({"params": p}, e, f, mask) ** 2).sum()

    out_x = layer.apply({"params": params}, edges, feat, mask)
    g_x = jax.grad(loss, argnums=(0, 1, 2))(params, edges, feat, "xla")
    monkeypatch.setenv("SCHEMANET_LN_BACKEND", "interpret")
    out_i = layer.apply({"params": params}, edges, feat, mask)
    g_i = jax.grad(loss, argnums=(0, 1, 2))(params, edges, feat, "interpret")

    np.testing.assert_allclose(np.asarray(out_i), np.asarray(out_x), rtol=1e-5, atol=1e-5)
    flat_x, _ = jax.tree_util.tree_flatten_with_path(g_x)
    flat_i, _ = jax.tree_util.tree_flatten_with_path(g_i)
    for (path, a), (_, b) in zip(flat_x, flat_i):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def test_fused_layernorm_gradient_parity(rng):
    """dx/dscale/dbias from the backward kernel match XLA autodiff (fp32)."""
    bs, n, d = 4, 13, 32
    x = jnp.asarray(rng.normal(size=(bs, n, d)).astype(np.float32))
    sc = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    bi = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))

    def ref(x, sc, bi):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = jnp.maximum((xf * xf).mean(-1, keepdims=True) - mu * mu, 0.0)
        return ((xf - mu) * jax.lax.rsqrt(var + 1e-6) * sc + bi).astype(x.dtype)

    g1 = jax.grad(
        lambda *a: jnp.sum(jnp.sin(fused_layernorm(*a, 1e-6, interpret=True))),
        argnums=(0, 1, 2),
    )(x, sc, bi)
    g2 = jax.grad(lambda *a: jnp.sum(jnp.sin(ref(*a))), argnums=(0, 1, 2))(x, sc, bi)
    for a, b, nm in zip(g1, g2, ("x", "scale", "bias")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5, err_msg=nm
        )
