"""Fused Pallas LayerNorm — forward AND backward, optional fused activation.

XLA's LayerNorm at the backbone shape (rows of d=192, a non-tile-aligned lane
count) lowers to compute-bound convert+reduce fusions that profiled at ~1.6 ms
per call — 2 per encoder layer, ~25% of the whole SchemaNet train step, for an
op whose HBM-optimal cost is ~0.15 ms. One Pallas pass per row block keeps the
fp32 statistics in VMEM and writes the normalised rows once.

The kernel is row-flattened: any [..., d] input is viewed as [N, d] and the
grid blocks over N (largest divisor of N that is a sublane multiple and fits
the VMEM budget). That lets the same kernel serve the backbone ([bs, 197, d])
and the class/instance GNN layers ([K, V, D] with K·V up to 500k rows at
ImageNet atlas scale) — the GNN's LN+activation tail is bandwidth-bound there
(~1 GB bf16 per tensor), so ``act='relu'`` additionally folds the activation
into the same pass (reference gnn.py:41-46: conv -> LayerNorm -> act) instead
of a separate elementwise round trip.

Differentiable via ``jax.custom_vjp``: the backward kernel recomputes the
row statistics from the saved input (cheaper than saving mean/rstd tensors —
the input is alive in the autodiff graph anyway), applies the activation
gate to the cotangent in-kernel (y is recomputed, never stored), and emits
dx plus per-block partial reductions for dscale/dbias, summed once outside
the kernel.

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

# fp32 bytes a single [rows, d] temp may occupy in VMEM. Forward holds ~2-3
# such temps; BACKWARD materialises ~6 (x, g, xhat, ga, dx, and the relu gate
# recompute) plus double-buffered io blocks — a 3 MB per-temp block measured
# 19.8 MB of scoped stack at the stage-0 shape ([50432, 192] → 3152-row
# blocks) and failed to compile (16 MB scoped-VMEM limit), so the backward
# uses its own smaller budget. Both env-tunable for on-chip sweeps.
_BLOCK_BYTES = int(os.environ.get("SCHEMANET_LN_FWD_BUDGET", 3 * 1024 * 1024))
_BWD_BLOCK_BYTES = int(os.environ.get("SCHEMANET_LN_BWD_BUDGET", 1_500_000))


def _row_block(n_rows: int, d: int, block_bytes: int = None) -> int:
    """Largest divisor of ``n_rows`` that is a multiple of 8 (fp32 sublane)
    and fits the VMEM budget; falls back to any divisor for tiny/odd N."""
    cap = max(8, (block_bytes or _BLOCK_BYTES) // (d * 4))
    best = 0
    for b in range(8, min(n_rows, cap) + 1, 8):
        if n_rows % b == 0:
            best = b
    if best:
        return best
    # no sublane-multiple divisor (small or odd N): largest divisor <= cap
    for b in range(min(n_rows, cap), 0, -1):
        if n_rows % b == 0:
            return b
    return 1


def _apply_act(y, act):
    if act == "relu":
        return jnp.maximum(y, 0.0)
    return y


def _ln_kernel(x_ref, scale_ref, bias_ref, out_ref, *, eps, act):
    x = x_ref[...].astype(jnp.float32)  # [Rb, d]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    # fast variance, flax.linen default (use_fast_variance=True)
    var = jnp.maximum(jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean, 0.0)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
    out_ref[...] = _apply_act(y, act).astype(out_ref.dtype)


def _ln_bwd_kernel(x_ref, scale_ref, bias_ref, g_ref, dx_ref, dparam_ref, *, eps, act):
    """Standard LayerNorm VJP with in-kernel stat (and activation) recompute:
    dx = r * (ga - mean(ga) - xhat * mean(ga * xhat)),  ga = dy * scale,
    with dy pre-gated by the activation derivative at the recomputed y;
    dscale/dbias accumulate across the sequential grid into a revisited
    [8, d] fp32 block (row 0 = dscale, row 1 = dbias; 8 sublanes to satisfy
    the TPU block-tiling rule — a [1, d] block would not lower)."""
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dparam_ref[...] = jnp.zeros_like(dparam_ref)

    x = x_ref[...].astype(jnp.float32)  # [Rb, d]
    g = g_ref[...].astype(jnp.float32)
    scale = scale_ref[...].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean, 0.0)
    r = jax.lax.rsqrt(var + eps)
    xhat = (x - mean) * r
    if act == "relu":
        y = xhat * scale + bias_ref[...].astype(jnp.float32)
        g = jnp.where(y > 0.0, g, 0.0)
    ga = g * scale
    dx = r * (
        ga
        - jnp.mean(ga, axis=-1, keepdims=True)
        - xhat * jnp.mean(ga * xhat, axis=-1, keepdims=True)
    )
    dx_ref[...] = dx.astype(dx_ref.dtype)
    dparam_ref[0, :] += jnp.sum(g * xhat, axis=0)
    dparam_ref[1, :] += jnp.sum(g, axis=0)


def _ln_call(x2, scale, bias, eps, act, interpret):
    n, d = x2.shape
    block = _row_block(n, d)
    return pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps, act=act),
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec((block, d), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda b: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, d), lambda b: (b, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, d), x2.dtype),
        cost_estimate=pl.CostEstimate(
            flops=8 * n * d,
            bytes_accessed=2 * x2.size * x2.dtype.itemsize,
            transcendentals=n,  # rsqrt
        ),
        interpret=interpret,
    )(x2, scale, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _ln(x2, scale, bias, eps, act, interpret):
    return _ln_call(x2, scale, bias, eps, act, interpret)


def _ln_fwd(x2, scale, bias, eps, act, interpret):
    return _ln_call(x2, scale, bias, eps, act, interpret), (x2, scale, bias)


def _ln_bwd(eps, act, interpret, res, g):
    x2, scale, bias = res
    n, d = x2.shape
    block = _row_block(n, d, _BWD_BLOCK_BYTES)
    dx, dparam = pl.pallas_call(
        functools.partial(_ln_bwd_kernel, eps=eps, act=act),
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec((block, d), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((d,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, d), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block, d), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, d), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, d), x2.dtype),
            jax.ShapeDtypeStruct((8, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=14 * n * d,
            bytes_accessed=3 * x2.size * x2.dtype.itemsize,
            transcendentals=n,
        ),
        interpret=interpret,
    )(x2, scale, bias, g)
    # grads land in the param dtype via the surrounding cast VJP (params fp32)
    return dx, dparam[0].astype(scale.dtype), dparam[1].astype(scale.dtype)


_ln.defvjp(_ln_fwd, _ln_bwd)


def fused_layernorm(
    x: jnp.ndarray,  # [..., d]
    scale: jnp.ndarray,  # [d]
    bias: jnp.ndarray,  # [d]
    eps: float = 1e-6,
    interpret: bool = False,
    act: str = "none",
) -> jnp.ndarray:
    """act(LayerNorm(x)) over the trailing axis; returns x.dtype.
    Differentiable. ``act``: 'none' | 'relu' (the GNN layers' default,
    reference gnn.py:41-46)."""
    d = x.shape[-1]
    out = _ln(x.reshape(-1, d), scale, bias, float(eps), act, interpret)
    return out.reshape(x.shape)


def layernorm_backend() -> str:
    """'pallas' | 'interpret' | 'xla' — the policy's ``ln`` field.

    Tuned default is the XLA path even on TPU (ops/policy.py: the fwd-only
    backbone LN measured 87.5 ms vs 97.6 ms with the Pallas kernel at the
    CIFAR SchemaNet step — XLA fuses LN into the adjacent converts/epilogues,
    while the standalone kernel forces an extra HBM round trip). The fused
    kernel stays available for explicit opt-in (`kernels.ln: pallas` /
    SCHEMANET_LN_BACKEND=pallas) and for fused-activation GNN-tail use.
    """
    from ..policy import resolve

    return resolve("ln")
