"""Fused Pallas transformer FFN (forward-only, frozen-backbone path).

The XLA path materialises the [bs, n, dim_feedforward] hidden state in HBM
twice per encoder layer (fc1 write + activation/fc2 read) — at DeiT-Tiny
bs=512 that is a 155 MB tensor, and the fc1 fusions alone profiled at ~22% of
the SchemaNet train step (HBM-bound). This kernel keeps the hidden state in
VMEM: a block of batch items is reshaped to a [block*n, d] row matrix (large
enough to tile the MXU well), fc1 -> activation -> fc2 run back to back, and
only the [.., d] output returns to HBM.

Forward-only by design, exactly like ``ops/pallas/attention.py`` — it serves
the *frozen* backbone forward; stage-0 backbone training keeps the
differentiable XLA path.

Numerics match ``flax.linen.Dense`` with the module compute dtype: operands
are cast to the compute dtype outside the kernel, the MXU accumulates in fp32
and rounds once to the operand dtype (the default dot semantics), bias-add and
activation run in the compute dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .layernorm import auto_backend, layernorm_backend


def mlp_backend() -> str:
    """'pallas' | 'interpret' | 'xla' — resolution of SCHEMANET_MLP_BACKEND.

    Unset defaults to the LN backend (SCHEMANET_LN_BACKEND), preserving the
    historical coupling; set it explicitly to toggle the fused FFN
    independently of the fused LayerNorm (e.g. SCHEMANET_LN_BACKEND=xla
    SCHEMANET_MLP_BACKEND=pallas keeps the FFN fusion while debugging LN).
    """
    import os

    mode = os.environ.get("SCHEMANET_MLP_BACKEND")
    if mode is None:
        return layernorm_backend()
    return auto_backend() if mode == "auto" else mode


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational erf, |error| <= 1.5e-7 in fp32.

    Mosaic lowers neither erf nor erfc, so jax.nn.gelu(approximate=False)
    cannot run in-kernel; 1.5e-7 is far below bf16 resolution (eps ~= 8e-3),
    making this numerically indistinguishable from the exact erf on the
    bf16 frozen path and ~1e-7-close in fp32."""
    a1, a2, a3, a4, a5 = 0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _kernel_activation(name):
    if name == "gelu":
        # exact-form (erf) gelu like the registry's nn.gelu(approximate=False),
        # computed in fp32 and cast back to the compute dtype
        def gelu(x):
            xf = x.astype(jnp.float32)
            return (xf * 0.5 * (1.0 + _erf(xf * 0.7071067811865476))).astype(x.dtype)

        return gelu
    from ...models.layers import get_activation

    return get_activation(name)


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, *, activation):
    # x_ref is a [rows, d] block (the caller flattens [bs, n, d] to rows —
    # a free XLA bitcast; an in-kernel (blk, n) -> blk*n merge would be an
    # unsupported Mosaic shape cast for sublane-unaligned n like 197).
    x = x_ref[...]
    # fp32 MXU accumulation rounded once to the compute dtype, then bias-add
    # in the compute dtype — the exact semantics of the XLA bf16 dense path
    # (Mosaic also requires the fp32 accumulator for bf16 matmuls)
    h = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32).astype(x.dtype)
    h = _kernel_activation(activation)(h + b1_ref[...])
    y = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32).astype(x.dtype)
    out_ref[...] = (y + b2_ref[...]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("activation", "interpret"))
def fused_mlp(
    x: jnp.ndarray,  # [bs, n, d]
    w1: jnp.ndarray,  # [d, f]
    b1: jnp.ndarray,  # [f]
    w2: jnp.ndarray,  # [f, d]
    b2: jnp.ndarray,  # [d]
    activation: str = "gelu",
    interpret: bool = False,
) -> jnp.ndarray:
    """act(x @ w1 + b1) @ w2 + b2 with the hidden state resident in VMEM."""
    bs, n, d = x.shape
    f = w1.shape[1]
    # all operands in the caller's compute dtype (flax Dense casts likewise)
    w1, b1, w2, b2 = (a.astype(x.dtype) for a in (w1, b1, w2, b2))
    # hidden block must respect the 16 MB scoped-vmem limit: keep the
    # [rows, f] hidden state around 2 MB and let double buffering breathe.
    # rows must be sublane-aligned (multiple of 8); a partial trailing block
    # (grid = ceil) is clipped by Pallas automatically.
    rows = max(256, min(2048, (2_500_000 // (f * x.dtype.itemsize)) // 256 * 256))
    xr = x.reshape(bs * n, d)  # free bitcast
    out = pl.pallas_call(
        functools.partial(_mlp_kernel, activation=activation),
        grid=(pl.cdiv(bs * n, rows),),
        in_specs=[
            pl.BlockSpec((rows, d), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda b: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, d), lambda b: (b, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bs * n, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bs * n * d * f,
            bytes_accessed=2 * x.size * x.dtype.itemsize
            + (w1.size + w2.size) * x.dtype.itemsize,
            transcendentals=bs * n * f,
        ),
        interpret=interpret,
    )(xr, w1, b1, w2, b2)
    return out.reshape(bs, n, d)
