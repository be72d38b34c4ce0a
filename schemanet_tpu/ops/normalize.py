"""Normalisation primitives shared by graph building and the IR-Atlas.

Functional re-design of the reference's ``schema_inference/graph/utils.py:7-52``
(in-place ``normalize_sum_``/``normalize_max_`` and the differentiable
``normalize_sum`` with optionally *detached* denominator). JAX is purely
functional so the in-place variants collapse into the same functions; the
``detach_sum`` behaviour maps to ``lax.stop_gradient`` on the denominator.

NaN convention: the reference applies ``nan_to_num(0)`` after each division so
all-zero rows normalise to zero rather than NaN. We replicate exactly that
(only NaN -> 0; torch's default would map inf to float-max, which never occurs
on the clamped-positive inputs used here).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _zero_nans(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(jnp.isnan(x), jnp.zeros_like(x), x)


def normalize_sum(
    x: jnp.ndarray, axis: int = -1, detach_sum: bool = False
) -> jnp.ndarray:
    """x / x.sum(axis), NaN -> 0. (graph/utils.py:25-34)

    The row sum always accumulates in fp32 (identical numerics for fp32
    inputs; for bf16 graph tensors — graph_precision='default' — it avoids
    compounding the reduction error on top of the storage rounding).
    """
    s = jnp.sum(x, axis=axis, keepdims=True, dtype=jnp.float32).astype(x.dtype)
    if detach_sum:
        s = jax.lax.stop_gradient(s)
    return _zero_nans(x / s)


def normalize_max(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """x / x.max(axis), NaN -> 0. (graph/utils.py:37-43)"""
    m = jnp.max(x, axis=axis, keepdims=True)
    return _zero_nans(x / m)


def normalize_sum_clamp(
    x: jnp.ndarray,
    axis: int = -1,
    detach_sum: bool = False,
    min_val: float = 0.0,
) -> jnp.ndarray:
    """clamp-min then sum-normalise (graph/utils.py:46-52)."""
    return normalize_sum(jnp.maximum(x, min_val), axis=axis, detach_sum=detach_sum)


def safe_softmax(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Softmax matching torch semantics for all -inf rows (-> NaN -> caller maps to 0).

    ``jax.nn.softmax`` uses a max-subtraction that turns an all ``-inf`` row
    into uniform outputs; torch produces NaN, which the reference then maps to
    zero (``schema_net.py:297``). We emit NaN for all -inf rows so callers can
    apply the same nan_to_num(0) convention.
    """
    m = jnp.max(x, axis=axis, keepdims=True)
    # keep -inf rows -inf (torch subtracts max=-inf giving nan; we reproduce it)
    e = jnp.exp(x - jnp.where(jnp.isfinite(m), m, 0.0))
    return e / jnp.sum(e, axis=axis, keepdims=True)
