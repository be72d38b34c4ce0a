"""Fused Pallas FFN vs the flax MLP module (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from schemanet_tpu.models.layers import MLP
from schemanet_tpu.ops.pallas.mlp import fused_mlp, mlp_backend


@pytest.mark.parametrize(
    "bs,n,d,f,dtype,act",
    [
        (4, 197, 192, 768, jnp.bfloat16, "gelu"),
        (2, 17, 64, 128, jnp.float32, "relu"),
        (1, 5, 32, 64, jnp.bfloat16, "gelu"),
    ],
)
def test_fused_mlp_matches_flax(rng, bs, n, d, f, dtype, act):
    x = jnp.asarray(rng.normal(size=(bs, n, d))).astype(dtype)
    mlp = MLP(embed_dim=d, dim_feedforward=f, activation=act, dtype=dtype)
    variables = mlp.init(jax.random.PRNGKey(0), x)
    want = mlp.apply(variables, x)
    p = variables["params"]
    got = fused_mlp(
        x,
        p["linear1"]["kernel"], p["linear1"]["bias"],
        p["linear2"]["kernel"], p["linear2"]["bias"],
        activation=act, interpret=True,
    )
    assert got.dtype == want.dtype
    np.testing.assert_allclose(
        np.asarray(got, np.float32),
        np.asarray(want, np.float32),
        rtol=1e-4,
        atol=1e-5 if dtype == jnp.float32 else 0.1,
    )


def test_predictor_fused_mlp_matches_xla(rng, monkeypatch):
    # end-to-end: frozen forward with the fused FFN (interpret mode) matches
    # the plain path (mlp backend is policy-resolved, env-overridable)
    from tests.test_predictor import make_predictor

    predictor = make_predictor()
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    variables = predictor.init(jax.random.PRNGKey(0), x, method="init_full")

    monkeypatch.setenv("SCHEMANET_MLP_BACKEND", "xla")
    plain = predictor.apply(variables, x, True)
    monkeypatch.setenv("SCHEMANET_MLP_BACKEND", "interpret")
    monkeypatch.setenv("SCHEMANET_LN_BACKEND", "interpret")
    fused = predictor.apply(variables, x, True)

    np.testing.assert_allclose(
        np.asarray(fused["pred"]), np.asarray(plain["pred"]), rtol=1e-4, atol=1e-5
    )


def test_backend_alias():
    assert mlp_backend() in ("xla", "pallas", "interpret")


@pytest.mark.parametrize("bs,n", [(4, 13), (2, 7)])  # bs*n never divides rows: tail path
def test_fused_mlp_gradient_parity(rng, bs, n):
    """All five grads (x, w1, b1, w2, b2) from the backward kernel match XLA
    autodiff, including the partial trailing row-block (whose garbage rows
    must be masked out of the accumulated weight grads)."""
    d, f = 32, 64
    x = jnp.asarray(rng.normal(size=(bs, n, d)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(d, f)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.normal(size=(f,)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.normal(size=(f, d)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.normal(size=(d,)).astype(np.float32) * 0.1)

    def ref(x, w1, b1, w2, b2):
        h = jax.nn.gelu(jnp.dot(x, w1) + b1, approximate=False)
        return jnp.dot(h, w2) + b2

    g1 = jax.grad(
        lambda *a: jnp.sum(jnp.sin(fused_mlp(*a, "gelu", interpret=True))),
        argnums=tuple(range(5)),
    )(x, w1, b1, w2, b2)
    g2 = jax.grad(
        lambda *a: jnp.sum(jnp.sin(ref(*a))), argnums=tuple(range(5))
    )(x, w1, b1, w2, b2)
    for a, b, nm in zip(g1, g2, ("x", "w1", "b1", "w2", "b2")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5, err_msg=nm
        )


def test_dropout_path_lowers_for_tpu():
    """The in-kernel dropout (PRNG) path has no CPU/interpret lowering, but
    Mosaic conversion happens at trace time — so unsupported-op regressions
    in the dropout fwd+bwd are catchable off-chip by lowering for TPU at the
    stage-0 shape. (Mask correctness itself is pinned on hardware by
    tools/check_dropout_grad.py.)"""
    import jax

    from schemanet_tpu.ops.pallas.mlp import fused_mlp

    x = jnp.zeros((64, 197, 192), jnp.bfloat16)
    w1 = jnp.zeros((192, 768), jnp.bfloat16)
    b1 = jnp.zeros((768,), jnp.bfloat16)
    w2 = jnp.zeros((768, 192), jnp.bfloat16)
    b2 = jnp.zeros((192,), jnp.bfloat16)

    def f(q):
        return jax.grad(
            lambda t: jnp.sum(
                fused_mlp(t, w1, b1, w2, b2, dropout_p=0.1, seed=7).astype(jnp.float32)
            )
        )(q)

    jax.jit(f).trace(x).lower(lowering_platforms=("tpu",))


def test_attention_dropout_path_lowers_for_tpu():
    import jax

    from schemanet_tpu.ops.pallas.attention import fused_mhsa

    qkv = jnp.zeros((16, 197, 3 * 3 * 64), jnp.bfloat16)

    def f(q):
        return jax.grad(
            lambda t: jnp.sum(
                fused_mhsa(t, 3, dropout_p=0.1, seed=5).astype(jnp.float32)
            )
        )(q)

    jax.jit(f).trace(qkv).lower(lowering_platforms=("tpu",))
