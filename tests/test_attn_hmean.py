"""attn_hmean probe: head-mean of pre-softmax scores, emitted by the fused
attn_block kernel (ops/pallas/encoder_block.py capture_hmean) so the SchemaNet
capture layer keeps the whole-layer fused path (schema/predictor.py).

Reference semantics anchor: ingredient_model_wrapper.py:61 (the hooked raw
attention is meaned over heads before the graph build — the mean is the only
statistic ever consumed)."""

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


def _plain_hmean(layer, params, x):
    """The plain path's probe (fp32 mean of the surfaced attn_raw)."""
    _, probes = layer.apply(params, x, None, True, False, False)
    return probes["attn_hmean"]


@pytest.mark.parametrize(
    "dtype,rtol,atol",
    [(jnp.float32, 2e-5, 2e-5), (jnp.bfloat16, 2e-2, 2e-2)],
)
def test_kernel_hmean_matches_plain(rng, dtype, rtol, atol):
    layer = _layer(dtype)
    x = jnp.asarray(rng.normal(size=(3, 17, 32)).astype(np.float32), dtype)
    params = layer.init(jax.random.PRNGKey(0), x)

    want = _plain_hmean(layer, params, x)
    assert want.shape == (3, 17, 17)

    policy.configure({"block": "interpret"})
    out, probes = layer.apply(
        params, x, None, True, False, False, False, True, True
    )  # block_fuse=True, capture_hmean=True
    assert set(probes) == {"out", "attn_hmean"}
    np.testing.assert_allclose(
        np.asarray(probes["attn_hmean"], np.float32),
        np.asarray(want, np.float32),
        rtol=rtol, atol=atol,
    )
    # the sequence output is the same whether or not the probe is captured
    plain_out, _ = layer.apply(params, x, None, True, False, False, False, True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(plain_out, np.float32),
        rtol=0, atol=0,
    )


def test_kernel_hmean_pair_packed(rng):
    """Pair-packed attention (head_dim 64) surfaces the same head-mean."""
    layer = _layer(jnp.float32, d=128, heads=2, f=128)
    x = jnp.asarray(rng.normal(size=(2, 9, 128)).astype(np.float32))
    params = layer.init(jax.random.PRNGKey(0), x)
    want = _plain_hmean(layer, params, x)

    policy.configure({"block": "interpret", "attn_pack": "pair"})
    _, probes = layer.apply(params, x, None, True, False, False, False, True, True)
    np.testing.assert_allclose(
        np.asarray(probes["attn_hmean"]), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_transformer_capture_keeps_block_fusion(rng):
    """Capturing attn_hmean must not force the plain path: with the block
    backend on, the captured value comes from the kernel and the final
    sequence matches the uncaptured fused run exactly."""
    model = Transformer(
        num_encoder_layers=3, num_heads=2, embed_dim=32, dim_feedforward=64,
        dropout=None, activation="gelu", final_norm=True, norm_eps=1e-6,
    )
    x = jnp.asarray(rng.normal(size=(2, 9, 32)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(1), x)

    ref, cap_plain = model.apply(
        params, x, method=Transformer.run, capture=("layers_1.attn_hmean",)
    )
    policy.configure({"block": "interpret"})
    fused_nocap, _ = model.apply(params, x, method=Transformer.run)
    fused, cap = model.apply(
        params, x, method=Transformer.run, capture=("layers_1.attn_hmean",)
    )
    # identical to the uncaptured fused run (same kernels, extra output only)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(fused_nocap), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(cap["layers_1.attn_hmean"]),
        np.asarray(cap_plain["layers_1.attn_hmean"]),
        rtol=2e-5, atol=2e-5,
    )


@pytest.mark.parametrize("pack", [False, True])
def test_hmean_mosaic_lowering(pack):
    """The capture_hmean kernel (plain and pair-packed) lowers through Mosaic
    off-chip — the no-hardware gate for TPU compilability."""
    from schemanet_tpu.ops.pallas.encoder_block import attn_block

    d, H, n, bs = 384, 6, 197, 4
    x = jnp.zeros((bs, n, d), jnp.bfloat16)
    g = jnp.zeros((d,), jnp.float32)
    wqkv = jnp.zeros((d, 3 * d), jnp.float32)
    bqkv = jnp.zeros((3 * d,), jnp.float32)
    wo = jnp.zeros((d, d), jnp.float32)

    jax.jit(
        lambda x: attn_block(
            x, g, g, wqkv, bqkv, wo, g, H, pack=pack, capture_hmean=True
        )
    ).trace(x).lower(lowering_platforms=("tpu",))


def test_attn_raw_probe_still_forces_plain_path(rng):
    """The public attn/attn_raw capture API is unchanged: requesting the full
    per-head tensor still takes the plain path and returns [bs, H, n, n]."""
    model = Transformer(
        num_encoder_layers=2, num_heads=2, embed_dim=32, dim_feedforward=64,
        dropout=None, activation="gelu", final_norm=True, norm_eps=1e-6,
    )
    x = jnp.asarray(rng.normal(size=(2, 9, 32)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(1), x)
    policy.configure({"block": "interpret"})
    _, cap = model.apply(
        params, x, method=Transformer.run,
        capture=("layers_0.attn_raw", "layers_0.attn_hmean"),
    )
    assert cap["layers_0.attn_raw"].shape == (2, 2, 9, 9)
    np.testing.assert_allclose(
        np.asarray(cap["layers_0.attn_hmean"]),
        np.asarray(jnp.mean(cap["layers_0.attn_raw"].astype(jnp.float32), axis=1)),
        rtol=1e-6, atol=1e-6,
    )
