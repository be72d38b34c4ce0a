"""Visual-word quantisation (VQ): nearest-codebook assignment.

Replaces the reference's ``torch.cdist(seq, vocabulary).argmin(dim=1)``
(``discretization/discretization.py:58-70``). On TPU the distance matrix is a
single MXU matmul: ``argmin_c ||x - c||^2 = argmin_c (||c||^2 - 2 x.c)`` — the
``||x||^2`` term is constant per row and dropped. Ties resolve to the lowest
code id (both torch and jnp argmin pick the first minimum).

The matmul runs in fp32 by default for assignment parity with the CPU
reference; pass ``compute_dtype=jnp.bfloat16`` to trade exact tie behaviour
for ~2x MXU throughput.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def vq_assign(
    x: jnp.ndarray,  # [..., d]
    codebook: jnp.ndarray,  # [M, d]
    compute_dtype=jnp.float32,
    backend: str = "auto",
) -> jnp.ndarray:
    """Return nearest-code ids with the leading shape of ``x``.

    ``backend``: 'xla' (score matrix in HBM, fused argmin by XLA), 'pallas'
    (streaming-argmin kernel, ops/pallas/vq.py — TPU only, worthwhile for
    large vocabularies where the [N, M] score materialisation dominates), or
    'auto' (currently = 'xla'; device context at trace time is ambiguous, so
    pallas stays opt-in via the SCHEMANET_VQ_BACKEND env var or explicit arg).
    """
    if backend == "auto":
        import os

        backend = os.environ.get("SCHEMANET_VQ_BACKEND", "xla")
    if backend == "pallas":
        from .pallas.vq import vq_assign_pallas

        return vq_assign_pallas(x, codebook)
    flat = x.reshape(-1, x.shape[-1]).astype(compute_dtype)
    cb = codebook.astype(compute_dtype)
    precision = (
        jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    )
    # [N, M]: ||c||^2 - 2 x.c  (argmin-equivalent to squared euclidean)
    scores = jnp.sum(cb * cb, axis=-1)[None, :] - 2.0 * jnp.matmul(
        flat, cb.T, precision=precision
    )
    ids = jnp.argmin(scores, axis=-1).astype(jnp.int32)
    return ids.reshape(x.shape[:-1])


def vq_encode(
    x: jnp.ndarray,  # [..., d]
    codebook: jnp.ndarray,  # [M, d]
    quantize: bool = True,
    detach_input: bool = True,
    compute_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(quantised-or-original features, code ids) — Discretization.encode.

    ``quantize=False`` mirrors ``Discretization.deactivate()``: ids are still
    computed but the original features flow onward (used by the CB agreement
    evaluation, reference ``evaluation.py:198-216``).
    """
    if detach_input:
        x = jax.lax.stop_gradient(x)
    ids = vq_assign(x, codebook, compute_dtype=compute_dtype)
    if quantize:
        out = jnp.take(codebook, ids, axis=0).astype(x.dtype)
    else:
        out = x
    return out, ids
