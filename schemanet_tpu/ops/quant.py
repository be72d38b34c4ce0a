"""Dynamic W8A8 post-training quantization for the frozen backbone.

Beyond-reference capability: the reference runs its frozen DeiT backbone in
fp32 everywhere (stage 1 feature extraction ``scripts/extract_ingredients.py``,
the frozen half of SchemaNet training, and serving). On TPU v5e the MXU's
int8 peak is 2x the bf16 peak (394 vs 197 TOP/s), and the backbone is frozen
in stages 1-4 — no training precision concerns — so the big projection
matmuls (qkv / out / fc1 / fc2) can run int8 x int8 -> int32 with
per-output-channel weight scales and per-token dynamic activation scales.

Numerics: symmetric quantization (no zero points — TPU int8 dots are fastest
symmetric, and LN'd activations are zero-centred anyway), round-to-nearest-
even, scales in fp32. Everything is shape-static and jit-friendly; the
weight quantization runs inside the same jit as the consuming matmul (the
weights are a few MB — quantizing them per step is noise next to the batch
matmuls, and when params are closure constants XLA constant-folds it).

Accuracy is gated by tests/test_quant.py (per-op exactness vs a numpy oracle
+ end-to-end backbone feature drift bounds) and the toy-pipeline A/B in
tools/ab_quant.sh.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# round-to-nearest-even matches the numpy oracle (np.rint) and avoids the
# 0.5-bias of floor(x+0.5) on the VPU
_round = jnp.rint


def quantize_weight(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-channel symmetric int8 quantization of a [in, out] kernel.

    Returns (w_i8 [in, out], scale [out] fp32) with w ~= w_i8 * scale.
    """
    w = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    w_i8 = jnp.clip(_round(w / scale), -127, 127).astype(jnp.int8)
    return w_i8, scale


def quantize_rows(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row (= per-token) symmetric int8 quantization of [..., in].

    Returns (x_i8, scale [..., 1] fp32) with x ~= x_i8 * scale.
    """
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    x_i8 = jnp.clip(_round(xf / scale), -127, 127).astype(jnp.int8)
    return x_i8, scale


def int8_dot(
    x: jnp.ndarray,  # [..., in] float
    w_i8: jnp.ndarray,  # [in, out] int8
    w_scale: jnp.ndarray,  # [out] fp32
    bias: Optional[jnp.ndarray] = None,  # [out]
) -> jnp.ndarray:
    """x @ dequant(w_i8) with the contraction done int8 x int8 -> int32 on the
    MXU; the fp32 rescale (per-row activation scale x per-channel weight
    scale) and bias-add fuse into the matmul epilogue. Output in x.dtype."""
    x_i8, x_scale = quantize_rows(x)
    y32 = jax.lax.dot_general(
        x_i8,
        w_i8,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y32.astype(jnp.float32) * (x_scale * w_scale)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def int8_dense(x: jnp.ndarray, params: dict) -> jnp.ndarray:
    """Drop-in int8 replacement for applying a flax Dense param dict
    ({'kernel': [in, out], optional 'bias': [out]})."""
    w_i8, w_scale = quantize_weight(params["kernel"])
    return int8_dot(x, w_i8, w_scale, params.get("bias"))
