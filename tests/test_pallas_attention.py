"""Fused Pallas attention vs the plain XLA path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from schemanet_tpu.models.attention import dot_product_attention
from schemanet_tpu.ops.pallas.attention import attention_backend, fused_mhsa


@pytest.mark.parametrize("bs,n,heads,d", [(2, 17, 3, 16), (3, 8, 2, 8), (1, 5, 1, 4)])
def test_fused_mhsa_matches_plain(rng, bs, n, heads, d):
    qkv = rng.normal(size=(bs, n, 3 * heads * d)).astype(np.float32)
    got = fused_mhsa(jnp.asarray(qkv), heads, interpret=True)

    q, k, v = (
        jnp.moveaxis(jnp.asarray(qkv).reshape(bs, n, 3, heads, d)[:, :, i], 1, 2)
        for i in range(3)
    )
    out, _, _ = dot_product_attention(q, k, v)
    want = jnp.moveaxis(out, 1, 2).reshape(bs, n, heads * d)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-5)


def test_predictor_fused_backend_matches_xla(rng, monkeypatch):
    # end-to-end integration: the frozen forward with the fused kernel
    # (interpret mode) produces the same logits as the plain path, and the
    # capture layer's raw attention is still surfaced
    from tests.test_predictor import make_predictor

    predictor = make_predictor()
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    variables = predictor.init(jax.random.PRNGKey(0), x, method="init_full")

    monkeypatch.setenv("SCHEMANET_ATTN_BACKEND", "xla")
    plain = predictor.apply(variables, x, True)
    monkeypatch.setenv("SCHEMANET_ATTN_BACKEND", "interpret")
    fused = predictor.apply(variables, x, True)

    np.testing.assert_allclose(
        np.asarray(fused["pred"]), np.asarray(plain["pred"]), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(fused["attn_cls"]), np.asarray(plain["attn_cls"]), rtol=1e-4, atol=1e-5
    )


def test_backend_resolution(monkeypatch):
    monkeypatch.setenv("SCHEMANET_ATTN_BACKEND", "pallas")
    assert attention_backend() == "pallas"
    monkeypatch.setenv("SCHEMANET_ATTN_BACKEND", "auto")
    assert attention_backend() == "xla"  # CPU test env
    monkeypatch.delenv("SCHEMANET_ATTN_BACKEND")
    assert attention_backend() == "xla"


@pytest.mark.parametrize("bs,n,heads,d", [(2, 17, 3, 16), (3, 8, 2, 8)])
def test_fused_mhsa_gradient_parity(rng, bs, n, heads, d):
    """The recompute VJP (flash backward) matches XLA autodiff exactly
    (fp32, interpret mode)."""
    qkv = jnp.asarray(rng.normal(size=(bs, n, 3 * heads * d)).astype(np.float32))

    def ref(q4):
        q, k, v = (
            jnp.moveaxis(q4.reshape(bs, n, 3, heads, d)[:, :, i], 1, 2)
            for i in range(3)
        )
        out, _, _ = dot_product_attention(q, k, v)
        return jnp.moveaxis(out, 1, 2).reshape(bs, n, heads * d)

    # sin() makes the cotangent nonuniform so every VJP term is exercised
    g1 = jax.grad(lambda q: jnp.sum(jnp.sin(fused_mhsa(q, heads, interpret=True))))(qkv)
    g2 = jax.grad(lambda q: jnp.sum(jnp.sin(ref(q))))(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)


def test_encoder_layer_training_grads_fused_vs_xla(rng, monkeypatch):
    """A full encoder layer (attention + LN + FFN all fused, dropout off)
    backpropagates identically to the XLA path — the stage-0 training
    configuration modulo dropout (whose in-kernel PRNG needs real TPU)."""
    from schemanet_tpu.models.transformer import EncoderLayer

    layer = EncoderLayer(
        num_heads=2, embed_dim=32, dim_feedforward=64,
        dropout=None, activation="gelu", norm_eps=1e-6,
    )
    x = jnp.asarray(rng.normal(size=(2, 9, 32)).astype(np.float32))
    params = layer.init(jax.random.PRNGKey(0), x)["params"]

    def loss(p, fused):
        out, _ = layer.apply({"params": p}, x, None, True, fused, fused)
        return jnp.sum(jnp.sin(out))

    for name in ("ATTN", "LN", "MLP"):
        monkeypatch.setenv(f"SCHEMANET_{name}_BACKEND", "xla")
    g_xla = jax.grad(loss)(params, False)
    for name in ("ATTN", "LN", "MLP"):
        monkeypatch.setenv(f"SCHEMANET_{name}_BACKEND", "interpret")
    g_fused = jax.grad(loss)(params, True)

    for (k1, v1), (k2, v2) in zip(
        jax.tree_util.tree_leaves_with_path(g_xla),
        jax.tree_util.tree_leaves_with_path(g_fused),
    ):
        np.testing.assert_allclose(
            np.asarray(v1), np.asarray(v2), rtol=2e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(k1),
        )
