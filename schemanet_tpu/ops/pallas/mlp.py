"""Fused Pallas transformer FFN — forward AND backward.

The XLA path materialises the [bs, n, dim_feedforward] hidden state in HBM
twice per encoder layer (fc1 write + activation/fc2 read) — at DeiT-Tiny
bs=512 that is a 155 MB tensor, and the fc1 fusions alone profiled at ~22% of
the SchemaNet train step (HBM-bound); in training the same tensor re-
materialises for the backward pass. This kernel keeps the hidden state in
VMEM: a block of batch items is reshaped to a [rows, d] row matrix (large
enough to tile the MXU well), fc1 -> activation -> fc2 run back to back, and
only the [.., d] output returns to HBM.

Differentiable via ``jax.custom_vjp``: the backward kernel recomputes the
hidden state from the saved input block (so the only residuals are x and the
weights, both already alive in the autodiff graph — the [.., f] hidden state
is NEVER stored), computes dx in the same pass, and accumulates dw1/db1/dw2/
db2 across the sequential grid in revisited fp32 output blocks.

The reference's FFN dropout (between activation and fc2, layers/mlp.py:8-33)
runs INSIDE the kernel via the stateless counter-based hash mask
(ops/pallas/dropmask.py), keyed on (seed, absolute row, col): the
(position -> mask) mapping is independent of the block size, grid, and
backend, so the backward regenerates the identical mask instead of storing
it while forward keeps its LARGE row blocks under dropout. (The previous
stateful pltpu.prng_* chunk scheme failed the on-chip fixed-seed
finite-difference gradient check — see dropmask.py.)

Numerics match ``flax.linen.Dense`` with the module compute dtype: operands
are cast to the compute dtype outside the kernel, the MXU accumulates in fp32
and rounds once to the operand dtype (the default dot semantics), bias-add and
activation run in the compute dtype. Gradient parity vs the XLA path is
asserted by tests/test_pallas_mlp.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dropmask import hash_keep_mask


def mlp_backend() -> str:
    """'pallas' | 'interpret' | 'xla' — the policy's ``mlp`` field.

    Decoupled from the LN backend since round 4 (the round-3 coupling meant
    flipping LN to its XLA winner silently dropped the FFN fusion too):
    tuned default is the fused kernel on TPU ([X3] xla 105.5 ms vs 97.6 —
    the VMEM-resident hidden state wins), XLA elsewhere. See ops/policy.py.
    """
    from ..policy import resolve

    return resolve("mlp")


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


def _activation_grad(name):
    """d act / d x evaluated in fp32 (input in compute dtype)."""
    if name == "gelu":
        def dgelu(x):
            xf = x.astype(jnp.float32)
            cdf = 0.5 * (1.0 + _erf(xf * 0.7071067811865476))
            pdf = jnp.exp(-0.5 * xf * xf) * 0.3989422804014327
            return cdf + xf * pdf

        return dgelu
    if name == "relu":
        return lambda x: (x > 0).astype(jnp.float32)
    raise NotImplementedError(f"no in-kernel activation grad for {name!r}")


def _apply_ffn_dropout(h, seed_ref, dropout_p, inv=None):
    """Stateless counter-based dropout mask for this block (dropmask.py).

    The keep bit of hidden element (absolute row, col) is a pure hash of
    (seed, row, col) — identical under ANY block size, so the backward kernel
    regenerates the exact forward mask without storing the [rows, f] tensor.
    Returns where(keep, h * inv, 0) when ``inv`` is given (forward path) or
    the raw keep mask when not (backward reuses it twice)."""
    row0 = pl.program_id(0) * h.shape[0]
    keep = hash_keep_mask(seed_ref[0], 0, h.shape, dropout_p, row_offset=row0)
    if inv is None:
        return keep
    return jnp.where(keep, h * inv, 0.0)


def _mlp_kernel(
    seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, *, activation, dropout_p
):
    # x_ref is a [rows, d] block (the caller flattens [bs, n, d] to rows —
    # a free XLA bitcast; an in-kernel (blk, n) -> blk*n merge would be an
    # unsupported Mosaic shape cast for sublane-unaligned n like 197).
    x = x_ref[...]
    # fp32 MXU accumulation rounded once to the compute dtype, then bias-add
    # in the compute dtype — the exact semantics of the XLA bf16 dense path
    # (Mosaic also requires the fp32 accumulator for bf16 matmuls)
    h = jnp.dot(x, w1_ref[...], preferred_element_type=jnp.float32).astype(x.dtype)
    h = _kernel_activation(activation)(h + b1_ref[...])
    if dropout_p:
        h = _apply_ffn_dropout(
            h, seed_ref, dropout_p, inv=1.0 / (1.0 - dropout_p)
        ).astype(x.dtype)
    y = jnp.dot(h, w2_ref[...], preferred_element_type=jnp.float32).astype(x.dtype)
    out_ref[...] = (y + b2_ref[...]).astype(out_ref.dtype)


def _mlp_bwd_kernel(
    seed_ref, x_ref, w1_ref, b1_ref, w2_ref, g_ref,
    dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
    *, activation, dropout_p, total_rows,
):
    """Recompute fc1/act (+ the identical dropout mask) from the input block,
    then the full FFN VJP; weight/bias grads accumulate into revisited fp32
    blocks (the TPU grid is sequential, so += is race-free)."""
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    x = x_ref[...]  # [rows, d]
    g = g_ref[...]  # [rows, d]
    rows = x.shape[0]
    if total_rows % rows:
        # a partial trailing block reads undefined rows: outputs are clipped
        # by Pallas, but the dw/db ACCUMULATIONS would ingest the garbage —
        # zero both operands on out-of-range rows (NaN * 0 is NaN, so zeroing
        # g alone is not enough)
        row_id = pl.program_id(0) * rows + jax.lax.broadcasted_iota(
            jnp.int32, (rows, 1), 0
        )
        in_range = row_id < total_rows
        x = jnp.where(in_range, x, 0).astype(x.dtype)
        g = jnp.where(in_range, g, 0).astype(g.dtype)
    w1 = w1_ref[...]
    w2 = w2_ref[...]
    h_pre = jnp.dot(x, w1, preferred_element_type=jnp.float32).astype(x.dtype)
    h_pre = h_pre + b1_ref[...]
    a = _kernel_activation(activation)(h_pre)
    if dropout_p:
        keep = _apply_ffn_dropout(a, seed_ref, dropout_p)
        inv = 1.0 / (1.0 - dropout_p)
        a_used = jnp.where(keep, a * inv, 0.0).astype(x.dtype)
    else:
        a_used = a
    # fc2 VJP
    dw2_ref[...] += jax.lax.dot_general(
        a_used, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db2_ref[...] += jnp.sum(g.astype(jnp.float32), axis=0, keepdims=True)
    da_used = jax.lax.dot_general(
        g, w2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    if dropout_p:
        da = jnp.where(keep, da_used * inv, 0.0)
    else:
        da = da_used
    # activation VJP (fp32), then fc1 VJP
    dh = (da * _activation_grad(activation)(h_pre)).astype(x.dtype)
    dw1_ref[...] += jax.lax.dot_general(
        x, dh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    db1_ref[...] += jnp.sum(dh.astype(jnp.float32), axis=0, keepdims=True)
    dx_ref[...] = jax.lax.dot_general(
        dh, w1, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dx_ref.dtype)


def _fwd_rows(f: int, itemsize: int) -> int:
    # hidden block must respect the 16 MB scoped-vmem limit: keep the
    # [rows, f] hidden state around 2 MB and let double buffering breathe.
    # rows must be sublane-aligned (multiple of 8); a partial trailing block
    # (grid = ceil) is clipped by Pallas automatically.
    return max(256, min(2048, (2_500_000 // (f * itemsize)) // 256 * 256))


def _bwd_rows(f: int) -> int:
    # backward holds two fp32 [rows, f] temps + two fp32 weight-grad blocks;
    # stay well under the scoped-vmem limit
    budget = int(os.environ.get("SCHEMANET_MLP_BWD_BUDGET", 1_200_000))
    return max(256, min(1024, (budget // (f * 4)) // 256 * 256))


def _mlp_call(x, seed, w1, b1, w2, b2, activation, dropout_p, interpret):
    bs, n, d = x.shape
    f = w1.shape[1]
    # dropout does not constrain the forward block size: masks are keyed on
    # absolute (row, col), identical under any blocking. Dropout-live blocks
    # are capped at 768 rows (vs 1536) as VMEM headroom for the in-kernel
    # mask temps.
    rows = _fwd_rows(f, x.dtype.itemsize)
    if dropout_p:
        rows = min(rows, int(os.environ.get("SCHEMANET_MLP_DROP_ROWS", 768)))
    xr = x.reshape(bs * n, d)  # free bitcast
    out = pl.pallas_call(
        functools.partial(_mlp_kernel, activation=activation, dropout_p=dropout_p),
        grid=(pl.cdiv(bs * n, rows),),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
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
    )(seed, xr, w1, b1, w2, b2)
    return out.reshape(bs, n, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _mlp(x, seed, w1, b1, w2, b2, activation, dropout_p, interpret):
    return _mlp_call(x, seed, w1, b1, w2, b2, activation, dropout_p, interpret)


def _mlp_fwd(x, seed, w1, b1, w2, b2, activation, dropout_p, interpret):
    out = _mlp_call(x, seed, w1, b1, w2, b2, activation, dropout_p, interpret)
    return out, (x, seed, w1, b1, w2)


def _mlp_bwd(activation, dropout_p, interpret, res, g):
    x, seed, w1, b1, w2 = res
    bs, n, d = x.shape
    f = w1.shape[1]
    rows = _bwd_rows(f)
    xr = x.reshape(bs * n, d)
    gr = g.reshape(bs * n, d)
    dx, dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(
            _mlp_bwd_kernel,
            activation=activation,
            dropout_p=dropout_p,
            total_rows=bs * n,
        ),
        grid=(pl.cdiv(bs * n, rows),),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((rows, d), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, d), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows, d), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, f), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, d), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bs * n, d), x.dtype),
            jax.ShapeDtypeStruct((d, f), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
            jax.ShapeDtypeStruct((f, d), jnp.float32),
            jax.ShapeDtypeStruct((1, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * 2 * bs * n * d * f,
            bytes_accessed=3 * x.size * x.dtype.itemsize
            + 2 * (w1.size + w2.size) * x.dtype.itemsize,
            transcendentals=bs * n * f,
        ),
        interpret=interpret,
    )(seed, xr, w1, b1, w2, gr)
    seed_ct = np.zeros(seed.shape, jax.dtypes.float0)
    # weight/bias grads follow the operand dtype like the XLA dense VJP (the
    # surrounding cast-to-compute-dtype VJP upcasts to the fp32 params)
    return (
        dx.reshape(bs, n, d),
        seed_ct,
        dw1.astype(w1.dtype),
        db1[0].astype(b1.dtype),
        dw2.astype(w2.dtype),
        db2[0].astype(b1.dtype),
    )


_mlp.defvjp(_mlp_fwd, _mlp_bwd)


def fused_mlp(
    x: jnp.ndarray,  # [bs, n, d]
    w1: jnp.ndarray,  # [d, f]
    b1: jnp.ndarray,  # [f]
    w2: jnp.ndarray,  # [f, d]
    b2: jnp.ndarray,  # [d]
    activation: str = "gelu",
    interpret: bool = False,
    dropout_p: float = 0.0,
    seed: jnp.ndarray | None = None,  # int32 scalar; required when dropout_p > 0
) -> jnp.ndarray:
    """act(x @ w1 + b1) @ w2 + b2 with the hidden state resident in VMEM.

    Differentiable (recompute backward, fused weight-grad accumulation);
    ``dropout_p`` applies the reference's FFN dropout between activation and
    fc2 in-kernel, keyed on ``seed``.
    """
    if seed is None:
        assert not dropout_p, "dropout requires a seed"
        seed = jnp.zeros((1,), jnp.int32)
    else:
        seed = jnp.asarray(seed, jnp.int32).reshape((1,))
    # all operands in the caller's compute dtype (flax Dense casts likewise)
    w1, b1, w2, b2 = (a.astype(x.dtype) for a in (w1, b1, w2, b2))
    return _mlp(x, seed, w1, b1, w2, b2, activation, float(dropout_p), interpret)
