"""W8A8 PTQ path (ops/quant.py + the ``quant`` flag threaded through the
backbone): per-op exactness vs a numpy oracle, end-to-end feature drift
bounds, and the extraction integration.

The reference has no quantization — this is a beyond-parity capability for
the frozen backbone (stages 1/4 + serving), so the oracle here is our own
documented math, and the drift bounds gate that int8 features stay close
enough to fp32 for codebook extraction to be interchangeable.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from schemanet_tpu.models.vit import ViT
from schemanet_tpu.ops.quant import int8_dense, int8_dot, quantize_rows, quantize_weight


def _np_int8_dense(x, kernel, bias):
    """Numpy oracle of the documented quant math (round-to-nearest-even)."""
    w = kernel.astype(np.float64)
    w_scale = np.maximum(np.abs(w).max(axis=0), 1e-12) / 127.0
    w_i8 = np.clip(np.rint(w / w_scale), -127, 127).astype(np.int64)
    xf = x.astype(np.float64)
    x_scale = np.maximum(np.abs(xf).max(axis=-1, keepdims=True), 1e-12) / 127.0
    x_i8 = np.clip(np.rint(xf / x_scale), -127, 127).astype(np.int64)
    y = (x_i8 @ w_i8).astype(np.float64) * (x_scale * w_scale)
    if bias is not None:
        y = y + bias
    return y


def test_quantize_weight_roundtrip(rng):
    w = jnp.asarray(rng.normal(size=(64, 32)), jnp.float32)
    w_i8, scale = quantize_weight(w)
    assert w_i8.dtype == jnp.int8 and scale.shape == (32,)
    # dequantized weights within half a quantization step
    np.testing.assert_allclose(
        np.asarray(w_i8, np.float32) * np.asarray(scale),
        np.asarray(w),
        atol=float(np.asarray(scale).max()) * 0.5 + 1e-7,
    )
    # per-channel absmax hits +/-127 exactly
    assert int(np.abs(np.asarray(w_i8)).max(initial=0)) == 127


def test_quantize_rows_shapes(rng):
    x = jnp.asarray(rng.normal(size=(4, 7, 16)), jnp.float32)
    x_i8, scale = quantize_rows(x)
    assert x_i8.shape == x.shape and scale.shape == (4, 7, 1)


def test_int8_dot_matches_numpy_oracle(rng):
    x = np.asarray(rng.normal(size=(6, 11, 48)), np.float32)
    kernel = np.asarray(rng.normal(size=(48, 24)), np.float32)
    bias = np.asarray(rng.normal(size=(24,)), np.float32)
    got = int8_dense(jnp.asarray(x), {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)})
    want = _np_int8_dense(x, kernel, bias)
    # identical integer math; only the fp32-vs-fp64 rescale differs
    np.testing.assert_allclose(np.asarray(got, np.float64), want, rtol=1e-5, atol=1e-5)


def test_int8_dot_no_bias(rng):
    x = np.asarray(rng.normal(size=(5, 16)), np.float32)
    kernel = np.asarray(rng.normal(size=(16, 8)), np.float32)
    w_i8, w_scale = quantize_weight(jnp.asarray(kernel))
    got = int8_dot(jnp.asarray(x), w_i8, w_scale)
    want = _np_int8_dense(x, kernel, None)
    np.testing.assert_allclose(np.asarray(got, np.float64), want, rtol=1e-5, atol=1e-5)


def test_int8_dense_close_to_fp32(rng):
    # well-conditioned data: quant error of one W8A8 matmul stays ~1e-2 relative
    x = np.asarray(rng.normal(size=(32, 96)), np.float32)
    kernel = np.asarray(rng.normal(size=(96, 64)), np.float32) / np.sqrt(96)
    bias = np.zeros((64,), np.float32)
    got = np.asarray(
        int8_dense(jnp.asarray(x), {"kernel": jnp.asarray(kernel), "bias": jnp.asarray(bias)})
    )
    want = x @ kernel
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.02, rel


def _toy_vit():
    return ViT(
        num_classes=10,
        img_size=32,
        patch_size=8,
        embed_dim=64,
        num_encoder_layers=3,
        num_heads=2,
        dim_feedforward=128,
        activation="gelu",
    )


def test_encode_until_quant_feature_drift(rng):
    """End-to-end backbone drift gate: int8 features track fp32 closely enough
    that nearest-centroid assignments (what extraction/VQ consume) agree."""
    model = _toy_vit()
    img = jnp.asarray(rng.normal(size=(4, 32, 32, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img)["params"]
    ref, _ = model.apply({"params": params}, img, 3, method="encode_until")
    got, _ = model.apply({"params": params}, img, 3, method="encode_until", quant=True)
    ref = np.asarray(ref, np.float64).reshape(-1, ref.shape[-1])
    got = np.asarray(got, np.float64).reshape(-1, got.shape[-1])
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.05, rel
    cos = np.sum(got * ref, -1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(ref, axis=-1)
    )
    assert cos.min() > 0.99, cos.min()


def test_full_forward_quant_argmax_agreement(rng):
    """Classifier-level gate at random init: logits from the quantized encoder
    agree with fp32 in argmax for the overwhelming majority of samples."""
    model = _toy_vit()
    img = jnp.asarray(rng.normal(size=(16, 32, 32, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(1), img)["params"]

    def logits(quant):
        seq, _ = model.apply(
            {"params": params}, img, 3, method="encode_until", quant=quant
        )
        return model.apply({"params": params}, seq, method="head")["pred"]

    a = np.argmax(np.asarray(logits(False)), -1)
    b = np.argmax(np.asarray(logits(True)), -1)
    assert (a == b).mean() >= 0.875, (a, b)


def test_collect_mid_features_quant(rng):
    """Extraction integration: the quant flag flows through collect_mid_features
    and yields features with the same shape/stat scale as fp32."""
    from schemanet_tpu.pipeline.extract_ingredients import collect_mid_features

    model = _toy_vit()
    img = np.asarray(rng.normal(size=(8, 32, 32, 3)), np.float32)
    params = model.init(jax.random.PRNGKey(2), jnp.asarray(img))["params"]
    loader = [{"image": img, "label": np.zeros((8,), np.int64)}]
    ref = collect_mid_features(model, params, loader, 1, 10_000)
    got = collect_mid_features(model, params, loader, 1, 10_000, quant=True)
    assert got.shape == ref.shape == (8 * 16, 64)
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.05, rel


def test_quant_composes_with_fused_interpret(rng):
    """quant + fused attention (interpret backend) — the serving/extraction
    operating point on TPU — matches the plain quant path."""
    import os

    model = _toy_vit()
    img = jnp.asarray(rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(3), img)["params"]
    plain, _ = model.apply({"params": params}, img, 3, method="encode_until", quant=True)
    os.environ["SCHEMANET_ATTN_BACKEND"] = "interpret"
    os.environ["SCHEMANET_LN_BACKEND"] = "interpret"
    try:
        fused, _ = model.apply(
            {"params": params}, img, 3, method="encode_until",
            fused_attention=True, quant=True,
        )
    finally:
        del os.environ["SCHEMANET_ATTN_BACKEND"]
        del os.environ["SCHEMANET_LN_BACKEND"]
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(plain), rtol=2e-2, atol=2e-3
    )
