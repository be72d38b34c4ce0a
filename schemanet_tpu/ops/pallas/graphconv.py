"""Fused Pallas GraphConv: ((E + E^T)/2 + I) @ f without HBM round trips.

The XLA path (schema/gnn.py `_sym_conv`) materialises E_sym in HBM (forward,
recomputed + CSEd in backward) and materialises t = g f^T before the
symmetrise `0.5 (t + t^T)` — at ImageNet atlas scale ([K=1000, V=500] graphs)
that is several ~0.5 GB tensors written and re-read per step, one of them
with a strided (transposed) access pattern. This kernel does the whole conv
per class graph in VMEM instead:

* forward: E_sym formed in VMEM (transpose is a register/VPU relayout; Mosaic
  lowers unaligned [V, V] transposes fine), ONE [V, V] x [V, D] matmul;
* backward: E_sym recomputed in VMEM, df = E_sym @ g (symmetry — no second
  orientation needed), t = g f^T via a single contraction over D, and
  de = 0.5 (t + t^T) symmetrised in VMEM — df and de are the only HBM writes.

Opt-in via SCHEMANET_GRAPHCONV_BACKEND=pallas (default: the XLA path) until
chip-measured; numerics (fp32 accumulation, cast once to the compute dtype)
match `_sym_conv`, pinned by tests/test_pallas_graphconv.py in interpret mode.

Reference semantics anchor: /root/reference/schema_inference/graph/gnn.py:20-31.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sym(e):
    """0.5 (e + e^T) + I in e.dtype — the exact arithmetic of the XLA path's
    symmetrize_edges (bf16 in training, fp32 in parity runs); staying in the
    input dtype also keeps the [V, V] VMEM temps small at CIFAR's V=1024."""
    return (e.dtype.type(0.5) * (e + e.T) + jnp.eye(e.shape[0], dtype=e.dtype)).astype(
        e.dtype
    )


def _fwd_kernel(e_ref, f_ref, out_ref):
    e_sym = _sym(e_ref[0])
    out_ref[0] = jax.lax.dot(
        e_sym, f_ref[0], preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def _bwd_kernel(e_ref, f_ref, g_ref, df_ref, de_ref):
    e_sym = _sym(e_ref[0])
    g = g_ref[0]
    # df = E_sym^T @ g = E_sym @ g by symmetry
    df_ref[0] = jax.lax.dot(
        e_sym, g, preferred_element_type=jnp.float32
    ).astype(df_ref.dtype)
    # dE_sym = g f^T; through d(sym)/dE the identity drops out and
    # dE = (dE_sym + dE_sym^T)/2 — one contraction over D, symmetrised in VMEM
    t = jax.lax.dot_general(
        g, f_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    de_ref[0] = (0.5 * (t + t.T)).astype(de_ref.dtype)


def _fwd_call(e, f, interpret):
    k, v, _ = e.shape
    d = f.shape[-1]
    return pl.pallas_call(
        _fwd_kernel,
        grid=(k,),
        in_specs=[
            pl.BlockSpec((1, v, v), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, v, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, v, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, v, d), f.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * k * v * v * d,
            bytes_accessed=(e.size + 2 * f.size) * f.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(e, f)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def sym_conv(e: jnp.ndarray, f: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """((E + E^T)/2 + I) @ f per leading batch entry, all in VMEM."""
    return _fwd_call(e, f, interpret)


def _sym_conv_fwd(e, f, interpret):
    return _fwd_call(e, f, interpret), (e, f)


def _sym_conv_bwd(interpret, res, g):
    e, f = res
    k, v, _ = e.shape
    d = f.shape[-1]
    df, de = pl.pallas_call(
        _bwd_kernel,
        grid=(k,),
        in_specs=[
            pl.BlockSpec((1, v, v), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, v, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, v, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, v, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, v, v), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, v, d), f.dtype),
            jax.ShapeDtypeStruct((k, v, v), e.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * k * v * v * d,
            bytes_accessed=(2 * e.size + 3 * f.size) * f.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(e, f, g)
    return de, df


sym_conv.defvjp(_sym_conv_fwd, _sym_conv_bwd)


def graphconv_backend() -> str:
    """'pallas' | 'interpret' | 'xla' — the policy's ``graphconv`` field.

    Tuned default 'xla' (the measured-good `_sym_conv` path); 'pallas' opts
    the GraphConv into this fused kernel. See ops/policy.py.
    """
    from ..policy import resolve

    return resolve("graphconv")


def shape_fits_kernel(v: int, d: int, itemsize: int = 2) -> bool:
    """Whether a [*, v, v] x [*, v, d] conv is worth one-graph-per-program.

    Two static gates (shapes are trace-time constants):
    * enough work per program to amortise the ~1.5 us DMA setup — instance
      graphs (v=196, ~0.08 GFLOP) are overhead-bound at bs>=512 and stay on
      the batched XLA dot; ImageNet class graphs (0.5 GFLOP) qualify;
    * VMEM: the backward holds the e/f/g/df/de blocks plus E_sym and an fp32
      t + its transpose — at v=1024 (CIFAR class graphs) that overflows the
      16 MB scoped-VMEM budget, so those also stay on XLA.
    """
    flops = 2 * v * v * d
    vmem = (
        3 * v * v * itemsize      # e block + E_sym + de
        + 3 * v * d * itemsize    # f, g, df
        + 2 * v * v * 4           # fp32 t and its transpose
    )
    return flops >= int(2e8) and vmem <= 11 * 1024 * 1024
