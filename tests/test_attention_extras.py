"""Per-head accessors and selective qkv gradient detach (mha.py parity)."""

import numpy as np

import jax
import jax.numpy as jnp

from schemanet_tpu.models.attention import (
    MultiHeadSelfAttention,
    head_slice,
    split_qkv_params,
)


def test_split_qkv_params(rng):
    d = 8
    kernel = rng.normal(size=(d, 3 * d)).astype(np.float32)
    bias = rng.normal(size=(3 * d,)).astype(np.float32)
    parts = split_qkv_params({"kernel": kernel, "bias": bias}, d)
    np.testing.assert_array_equal(parts["q"]["kernel"], kernel[:, :d])
    np.testing.assert_array_equal(parts["k"]["kernel"], kernel[:, d : 2 * d])
    np.testing.assert_array_equal(parts["v"]["bias"], bias[2 * d :])
    h = head_slice(parts["q"]["kernel"], head_id=1, num_heads=2)
    np.testing.assert_array_equal(h, kernel[:, d // 2 : d])


def test_detach_forward_identical_grads_differ(rng):
    seq = jnp.asarray(rng.normal(size=(2, 5, 8)).astype(np.float32))
    plain = MultiHeadSelfAttention(num_heads=2, embed_dim=8)
    detached = MultiHeadSelfAttention(num_heads=2, embed_dim=8, detach_w_qk=True)
    params = plain.init(jax.random.PRNGKey(0), seq)["params"]

    out_plain, _, _ = plain.apply({"params": params}, seq)
    out_det, _, _ = detached.apply({"params": params}, seq)
    np.testing.assert_allclose(np.asarray(out_plain), np.asarray(out_det), rtol=1e-5, atol=1e-5)

    def loss(mod):
        def f(p):
            out, _, _ = mod.apply({"params": p}, seq)
            return jnp.sum(out**2)

        return jax.grad(f)(params)["linear_qkv"]["kernel"]

    g_plain = np.asarray(loss(plain))
    g_det = np.asarray(loss(detached))
    d = 8
    # q/k blocks get zero grad when detached; v block unchanged
    np.testing.assert_allclose(g_det[:, : 2 * d], 0.0, atol=1e-7)
    assert not np.allclose(g_plain[:, : 2 * d], 0.0)
    np.testing.assert_allclose(g_det[:, 2 * d :], g_plain[:, 2 * d :], rtol=1e-4, atol=1e-5)
