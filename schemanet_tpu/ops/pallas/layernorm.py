"""Fused Pallas LayerNorm — forward AND backward.

XLA's LayerNorm at this model shape (rows of d=192, a non-tile-aligned lane
count) lowers to compute-bound convert+reduce fusions that profiled at ~1.6 ms
per call — 2 per encoder layer, ~25% of the whole SchemaNet train step, for an
op whose HBM-optimal cost is ~0.15 ms. One Pallas pass per row block keeps the
fp32 statistics in VMEM and writes the normalised rows once.

Differentiable via ``jax.custom_vjp``: the backward kernel recomputes the
row statistics from the saved input (cheaper than saving mean/rstd tensors —
the input is alive in the autodiff graph anyway) and emits dx plus per-block
partial reductions for dscale/dbias, summed once outside the kernel.

Numerics match ``flax.linen.LayerNorm``: statistics and the normalisation are
computed in fp32 (fast-variance form E[x^2] - E[x]^2), fp32 scale/bias applied
in fp32, output cast back to the input dtype. Gradient parity vs the XLA path
is asserted by tests/test_pallas_layernorm.py.
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


def _ln_bwd_kernel(x_ref, scale_ref, g_ref, dx_ref, dparam_ref, *, eps):
    """Standard LayerNorm VJP with in-kernel stat recompute:
    dx = r * (ga - mean(ga) - xhat * mean(ga * xhat)),  ga = dy * scale;
    dscale/dbias accumulate across the sequential grid into a revisited
    [8, d] fp32 block (row 0 = dscale, row 1 = dbias; 8 sublanes to satisfy
    the TPU block-tiling rule — a [1, d] block would not lower)."""
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dparam_ref[...] = jnp.zeros_like(dparam_ref)

    x = x_ref[...].astype(jnp.float32)  # [Bb, n, d]
    g = g_ref[...].astype(jnp.float32)
    scale = scale_ref[...].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean, 0.0)
    r = jax.lax.rsqrt(var + eps)
    xhat = (x - mean) * r
    ga = g * scale
    dx = r * (
        ga
        - jnp.mean(ga, axis=-1, keepdims=True)
        - xhat * jnp.mean(ga * xhat, axis=-1, keepdims=True)
    )
    dx_ref[...] = dx.astype(dx_ref.dtype)
    dparam_ref[0, :] += jnp.sum(g * xhat, axis=(0, 1))
    dparam_ref[1, :] += jnp.sum(g, axis=(0, 1))


def _row_block(bs: int) -> int:
    # fp32 temps cost block*n*d*4 bytes; the scoped-vmem limit is 16 MB, so
    # block=8 at [197, 192] rows (~5.7 MB + double-buffered bf16 io) is safe
    block = 8
    while bs % block:  # bs is a power-of-two batch in practice; 1 always divides
        block //= 2
    return block


def _ln_call(x, scale, bias, eps, interpret):
    bs, n, d = x.shape
    block = _row_block(bs)
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _ln(x, scale, bias, eps, interpret):
    return _ln_call(x, scale, bias, eps, interpret)


def _ln_fwd(x, scale, bias, eps, interpret):
    return _ln_call(x, scale, bias, eps, interpret), (x, scale)


def _ln_bwd(eps, interpret, res, g):
    x, scale = res
    bs, n, d = x.shape
    block = _row_block(bs)
    grid = bs // block
    dx, dparam = pl.pallas_call(
        functools.partial(_ln_bwd_kernel, eps=eps),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block, n, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, n, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block, n, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, d), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bs, n, d), x.dtype),
            jax.ShapeDtypeStruct((8, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=14 * bs * n * d,
            bytes_accessed=3 * x.size * x.dtype.itemsize,
            transcendentals=bs * n,
        ),
        interpret=interpret,
    )(x, scale, g)
    # grads land in the param dtype via the surrounding cast VJP (params fp32)
    return dx, dparam[0].astype(scale.dtype), dparam[1].astype(scale.dtype)


_ln.defvjp(_ln_fwd, _ln_bwd)


def fused_layernorm(
    x: jnp.ndarray,  # [bs, n, d]
    scale: jnp.ndarray,  # [d]
    bias: jnp.ndarray,  # [d]
    eps: float = 1e-6,
    interpret: bool = False,
) -> jnp.ndarray:
    """LayerNorm over the trailing axis; returns x.dtype. Differentiable."""
    return _ln(x, scale, bias, float(eps), interpret)


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
