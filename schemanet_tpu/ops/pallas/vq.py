"""Fused Pallas VQ kernel: nearest-codebook assignment with a streaming argmin.

The XLA path (ops/vq.py) materialises the [N, M] score matrix in HBM before
the argmin — at ImageNet scale (M=8000, N=bs*196) that is ~400 MB of HBM
traffic per call. This kernel tiles N x M on the MXU, keeps the running
(min, argmin) in VMEM scratch across the M dimension, and only ever writes the
[N] id vector — turning the op from HBM-bandwidth-bound into matmul-bound.

Tie-breaking matches torch/jnp argmin (first minimum wins): tiles scan M in
ascending order and later tiles must be strictly smaller to take over.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _vq_kernel(x_ref, cbt_ref, cnorm_ref, out_ref, min_scratch, arg_scratch, *, tile_m):
    m = pl.program_id(1)

    @pl.when(m == 0)
    def _():
        min_scratch[:] = jnp.full_like(min_scratch, jnp.inf)
        arg_scratch[:] = jnp.zeros_like(arg_scratch)

    # [tile_n, tile_m] partial squared distances (|x|^2 dropped: row-constant)
    scores = cnorm_ref[:] - 2.0 * jnp.dot(
        x_ref[:], cbt_ref[:], preferred_element_type=jnp.float32
    )
    local_min = jnp.min(scores, axis=1, keepdims=True)  # [tile_n, 1]
    local_arg = (
        jnp.argmin(scores, axis=1).astype(jnp.int32).reshape(-1, 1) + m * tile_m
    )
    better = local_min < min_scratch[:]
    arg_scratch[:] = jnp.where(better, local_arg, arg_scratch[:])
    min_scratch[:] = jnp.where(better, local_min, min_scratch[:])

    @pl.when(m == pl.num_programs(1) - 1)
    def _():
        out_ref[:] = arg_scratch[:]


@functools.partial(jax.jit, static_argnames=("tile_n", "tile_m", "interpret"))
def vq_assign_pallas(
    x: jnp.ndarray,  # [..., d]
    codebook: jnp.ndarray,  # [M, d]
    tile_n: int = 256,
    tile_m: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Nearest-code ids, shaped like ``x`` without the feature axis."""
    leading = x.shape[:-1]
    d = x.shape[-1]
    m = codebook.shape[0]
    flat = x.reshape(-1, d).astype(jnp.float32)
    n = flat.shape[0]

    tile_m = min(tile_m, m)
    tile_n = min(tile_n, max(8, n))
    pad_n = (-n) % tile_n
    pad_m = (-m) % tile_m
    if pad_n:
        flat = jnp.pad(flat, ((0, pad_n), (0, 0)))
    cbt = codebook.astype(jnp.float32).T  # [d, M]
    cnorm = jnp.sum(codebook.astype(jnp.float32) ** 2, axis=-1)[None, :]  # [1, M]
    if pad_m:
        # padded codes get +inf norm so they never win
        cbt = jnp.pad(cbt, ((0, 0), (0, pad_m)))
        cnorm = jnp.pad(cnorm, ((0, 0), (0, pad_m)), constant_values=jnp.inf)

    n_pad, m_pad = flat.shape[0], cbt.shape[1]
    grid = (n_pad // tile_n, m_pad // tile_m)

    out = pl.pallas_call(
        functools.partial(_vq_kernel, tile_m=tile_m),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, tile_m), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((tile_n, 1), jnp.float32),
            pltpu.VMEM((tile_n, 1), jnp.int32),
        ],
        interpret=interpret,
    )(flat, cbt, cnorm)
    return out[:n, 0].reshape(leading)
