"""Whole-encoder-half fused kernels (ops/pallas/encoder_block.py): numerics
parity vs the plain XLA path, probe/capture gating, and Mosaic lowering."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from schemanet_tpu.models.transformer import EncoderLayer, Transformer
from schemanet_tpu.ops import policy


@pytest.fixture(autouse=True)
def _reset_policy():
    policy.reset_policy()
    yield
    policy.reset_policy()


def _layer(dtype=jnp.float32, d=32, heads=2, f=64):
    return EncoderLayer(
        num_heads=heads, embed_dim=d, dim_feedforward=f,
        dropout=None, activation="gelu", norm_eps=1e-6, dtype=dtype,
    )


@pytest.mark.parametrize(
    "dtype,rtol,atol",
    [(jnp.float32, 2e-5, 2e-6), (jnp.bfloat16, 2e-2, 2e-2)],
)
def test_layer_parity(rng, dtype, rtol, atol):
    layer = _layer(dtype)
    x = jnp.asarray(rng.normal(size=(3, 17, 32)).astype(np.float32), dtype)
    params = layer.init(jax.random.PRNGKey(0), x)

    plain, _ = layer.apply(params, x, None, True, False, False)
    policy.configure({"block": "interpret"})
    fused, probes = layer.apply(params, x, None, True, True, True, False, True)
    np.testing.assert_allclose(
        np.asarray(fused, np.float32), np.asarray(plain, np.float32),
        rtol=rtol, atol=atol,
    )
    assert set(probes) == {"out"}  # whole-layer path surfaces no intermediates


def test_transformer_run_parity_and_probe_gating(rng):
    model = Transformer(
        num_encoder_layers=3, num_heads=2, embed_dim=32, dim_feedforward=64,
        dropout=None, activation="gelu", final_norm=True, norm_eps=1e-6,
    )
    x = jnp.asarray(rng.normal(size=(2, 9, 32)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(1), x)

    plain, _ = model.apply(params, x, method=Transformer.run)
    policy.configure({"block": "interpret", "attn": "interpret",
                      "ln": "interpret", "mlp": "interpret"})
    fused, _ = model.apply(params, x, method=Transformer.run)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(plain), rtol=2e-5, atol=2e-6)

    # capturing an intermediate probe of layer 1 must force that layer off
    # the whole-layer path and surface the SAME values as the plain path
    plain2, cap_plain = model.apply(
        params, x, None, True, ("layers_1.resid1", "layers_1.attn"),
        method=Transformer.run,
    )
    fused2, cap_fused = model.apply(
        params, x, None, True, ("layers_1.resid1", "layers_1.attn"),
        method=Transformer.run,
    )
    for k in ("layers_1.resid1", "layers_1.attn"):
        np.testing.assert_allclose(
            np.asarray(cap_fused[k]), np.asarray(cap_plain[k]), rtol=2e-5, atol=2e-6
        )
    np.testing.assert_allclose(np.asarray(fused2), np.asarray(plain), rtol=2e-5, atol=2e-6)


def test_block_skips_nondeterministic(rng):
    """dropout-live calls must NOT take the forward-only whole-layer path."""
    layer = EncoderLayer(
        num_heads=2, embed_dim=32, dim_feedforward=64,
        dropout=0.2, activation="gelu", norm_eps=1e-6,
    )
    x = jnp.asarray(rng.normal(size=(2, 9, 32)).astype(np.float32))
    params = layer.init(jax.random.PRNGKey(0), x)
    policy.configure({"block": "interpret"})
    out, probes = layer.apply(
        params, x, None, False, False, False, False, True,
        rngs={"dropout": jax.random.PRNGKey(3)},
    )
    # non-deterministic path keeps full probes (resid1/resid2/out)
    assert {"resid1", "resid2", "out"} <= set(probes)
    assert np.isfinite(np.asarray(out, np.float32)).all()


@pytest.mark.parametrize("heads", [2, 3])  # even (all pairs) and odd (pair + tail)
def test_attn_pack_parity(rng, heads):
    """Pair-packed head_dim-64 attention (policy attn_pack=pair) must match
    the per-head path bit-for-tolerance: same fp32 score/softmax order, padded
    key columns masked to exp(-inf)=0."""
    from schemanet_tpu.ops.pallas.encoder_block import attn_block

    d, n, bs = 64 * heads, 50, 2  # n=50 -> n_pad=128 exercises the masking
    x = jnp.asarray(rng.normal(size=(bs, n, d)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(d,)).astype(np.float32))
    be = jnp.asarray(rng.normal(size=(d,)).astype(np.float32) * 0.1)
    wqkv = jnp.asarray(rng.normal(size=(d, 3 * d)).astype(np.float32) * 0.1)
    bqkv = jnp.asarray(rng.normal(size=(3 * d,)).astype(np.float32) * 0.1)
    wo = jnp.asarray(rng.normal(size=(d, d)).astype(np.float32) * 0.1)
    bo = jnp.asarray(rng.normal(size=(d,)).astype(np.float32) * 0.1)

    base = attn_block(x, g, be, wqkv, bqkv, wo, bo, heads, interpret=True, pack=False)
    packed = attn_block(x, g, be, wqkv, bqkv, wo, bo, heads, interpret=True, pack=True)
    np.testing.assert_allclose(
        np.asarray(packed), np.asarray(base), rtol=2e-5, atol=2e-6
    )


def test_attn_pack_policy_transformer_parity(rng):
    """attn_pack=pair via the kernel policy must leave Transformer.run output
    unchanged (d=64 heads, frozen deterministic path)."""
    model = Transformer(
        num_encoder_layers=2, num_heads=2, embed_dim=128, dim_feedforward=256,
        dropout=None, activation="gelu", final_norm=True, norm_eps=1e-6,
    )
    x = jnp.asarray(rng.normal(size=(2, 9, 128)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(1), x)

    policy.configure({"block": "interpret"})
    base, _ = model.apply(params, x, method=Transformer.run)
    policy.configure({"block": "interpret", "attn_pack": "pair"})
    packed, _ = model.apply(params, x, method=Transformer.run)
    np.testing.assert_allclose(
        np.asarray(packed), np.asarray(base), rtol=2e-5, atol=2e-6
    )


def test_attn_pack_mosaic_lowering():
    from schemanet_tpu.ops.pallas.encoder_block import attn_block

    d, H, n, bs = 384, 6, 197, 4
    x = jnp.zeros((bs, n, d), jnp.bfloat16)
    g = jnp.zeros((d,), jnp.float32)
    wqkv = jnp.zeros((d, 3 * d), jnp.float32)
    bqkv = jnp.zeros((3 * d,), jnp.float32)
    wo = jnp.zeros((d, d), jnp.float32)

    jax.jit(
        lambda x: attn_block(x, g, g, wqkv, bqkv, wo, g, H, pack=True)
    ).trace(x).lower(lowering_platforms=("tpu",))


def test_mosaic_lowering():
    """Both block kernels lower for TPU off-chip (the /verify trick)."""
    from schemanet_tpu.ops.pallas.encoder_block import attn_block, ffn_block

    d, f, H, n, bs = 192, 768, 3, 197, 8
    x = jnp.zeros((bs, n, d), jnp.bfloat16)
    g = jnp.zeros((d,), jnp.float32)
    wqkv = jnp.zeros((d, 3 * d), jnp.float32)
    bqkv = jnp.zeros((3 * d,), jnp.float32)
    wo = jnp.zeros((d, d), jnp.float32)
    w1 = jnp.zeros((d, f), jnp.float32)
    b1 = jnp.zeros((f,), jnp.float32)
    w2 = jnp.zeros((f, d), jnp.float32)

    def fwd(x):
        y = attn_block(x, g, g, wqkv, bqkv, wo, g, H)
        return ffn_block(y, g, g, w1, b1, w2, g)

    jax.jit(fwd).trace(x).lower(lowering_platforms=("tpu",))
