"""Fused Pallas LayerNorm (forward-only, frozen-backbone path).

XLA's LayerNorm at this model shape (rows of d=192, a non-tile-aligned lane
count) lowers to compute-bound convert+reduce fusions that profiled at ~1.6 ms
per call — 2 per encoder layer, ~25% of the whole SchemaNet train step, for an
op whose HBM-optimal cost is ~0.15 ms. One Pallas pass per row block keeps the
fp32 statistics in VMEM and writes the normalised rows once.

Forward-only by design, exactly like ``ops/pallas/attention.py``: it serves
the *frozen* backbone forward (predictor wraps backbone outputs in
stop_gradient, mirroring the reference's no-grad TorchScript traces,
``graph/__init__.py:39-40``). Stage-0 backbone training keeps the
differentiable XLA path.

Numerics match ``flax.linen.LayerNorm``: statistics and the normalisation are
computed in fp32 (fast-variance form E[x^2] - E[x]^2), fp32 scale/bias applied
in fp32, output cast back to the input dtype.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_kernel(x_ref, scale_ref, bias_ref, out_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)  # [Bb, n, d]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    # fast variance, flax.linen default (use_fast_variance=True)
    var = jnp.maximum(jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean, 0.0)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
    out_ref[...] = y.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_layernorm(
    x: jnp.ndarray,  # [bs, n, d]
    scale: jnp.ndarray,  # [d]
    bias: jnp.ndarray,  # [d]
    eps: float = 1e-6,
    interpret: bool = False,
) -> jnp.ndarray:
    """LayerNorm over the trailing axis; returns x.dtype. Forward-only."""
    bs, n, d = x.shape
    # fp32 temps cost block*n*d*4 bytes; the scoped-vmem limit is 16 MB, so
    # block=8 at [197, 192] rows (~5.7 MB + double-buffered bf16 io) is safe
    block = 8
    while bs % block:  # bs is a power-of-two batch in practice; 1 always divides
        block //= 2
    return pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(bs // block,),
        in_specs=[
            pl.BlockSpec((block, n, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda b: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block, n, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bs, n, d), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=8 * bs * n * d,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=bs * n,  # rsqrt
        ),
        interpret=interpret,
    )(x, scale, bias)


def layernorm_backend() -> str:
    """'pallas' | 'interpret' | 'xla' — resolution of SCHEMANET_LN_BACKEND.

    'auto' (default) picks the fused kernel on TPU-like platforms and the
    plain XLA path elsewhere ('interpret' lets CPU tests exercise the
    integration end to end), mirroring ``attention_backend``.
    """
    mode = os.environ.get("SCHEMANET_LN_BACKEND", "auto")
    return auto_backend() if mode == "auto" else mode


def auto_backend() -> str:
    """Platform default: fused kernel on TPU-like backends, XLA elsewhere."""
    try:
        platform = jax.devices()[0].platform
    except Exception:
        platform = "cpu"
    return "pallas" if platform in ("tpu", "axon") else "xla"
