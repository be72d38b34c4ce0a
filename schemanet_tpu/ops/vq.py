"""Visual-word quantisation (VQ): nearest-codebook assignment.

Replaces the reference's ``torch.cdist(seq, vocabulary).argmin(dim=1)``
(``discretization/discretization.py:58-70``). On TPU the distance matrix is a
single MXU matmul: ``argmin_c ||x - c||^2 = argmin_c (||c||^2 - 2 x.c)`` — the
``||x||^2`` term is constant per row and dropped. Ties resolve to the lowest
code id (both torch and jnp argmin pick the first minimum).

The score matmul follows the input dtype: fp32 inputs (parity runs, golden
tests, k-means on fp32 features) use fp32 ``Precision.HIGHEST`` for exact
assignment parity with the CPU reference; bf16 inputs (the bf16 training
path — the mid features are already bf16-rounded) run the matmul at full
MXU rate with an fp32 accumulator, so the *scores* are still fp32 and only
the codebook rounds to bf16. Pass ``compute_dtype`` to force either.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def vq_assign(
    x: jnp.ndarray,  # [..., d]
    codebook: jnp.ndarray,  # [M, d]
    compute_dtype=None,
    backend: str = "auto",
) -> jnp.ndarray:
    """Return nearest-code ids with the leading shape of ``x``.

    ``backend``: 'xla' (score matrix in HBM, fused argmin by XLA), 'pallas'
    (streaming-argmin kernel, ops/pallas/vq.py — TPU only, worthwhile for
    large vocabularies where the [N, M] score materialisation dominates), or
    'auto' (the policy's ``vq`` field — tuned default 'xla'; opt into pallas
    via `kernels.vq: pallas` / SCHEMANET_VQ_BACKEND. See ops/policy.py).
    """
    if backend == "auto":
        from .policy import resolve

        backend = resolve("vq")
    if backend == "pallas":
        from .pallas.vq import vq_assign_pallas

        return vq_assign_pallas(x, codebook)
    if compute_dtype is None:
        compute_dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    flat = x.reshape(-1, x.shape[-1]).astype(compute_dtype)
    cb = codebook.astype(compute_dtype)
    # [N, M]: ||c||^2 - 2 x.c  (argmin-equivalent to squared euclidean);
    # norms and scores stay fp32 in both modes — in bf16 mode the MXU runs
    # at full rate with an fp32 accumulator (profiled 20 -> ~6 ms at
    # ImageNet bs=1024), in fp32 mode HIGHEST gives reference bit-parity
    precision = (
        jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32 else None
    )
    dots = jax.lax.dot_general(
        flat,
        cb,
        (((1,), (1,)), ((), ())),
        precision=precision,
        preferred_element_type=jnp.float32,
    )
    cb_f = cb.astype(jnp.float32)
    scores = jnp.sum(cb_f * cb_f, axis=-1)[None, :] - 2.0 * dots
    ids = jnp.argmin(scores, axis=-1).astype(jnp.int32)
    return ids.reshape(x.shape[:-1])


def vq_encode(
    x: jnp.ndarray,  # [..., d]
    codebook: jnp.ndarray,  # [M, d]
    quantize: bool = True,
    detach_input: bool = True,
    compute_dtype=None,
    backend: str = "auto",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(quantised-or-original features, code ids) — Discretization.encode.

    ``quantize=False`` mirrors ``Discretization.deactivate()``: ids are still
    computed but the original features flow onward (used by the CB agreement
    evaluation, reference ``evaluation.py:198-216``).
    """
    if detach_input:
        x = jax.lax.stop_gradient(x)
    ids = vq_assign(x, codebook, compute_dtype=compute_dtype, backend=backend)
    if quantize:
        out = jnp.take(codebook, ids, axis=0).astype(x.dtype)
    else:
        out = x
    return out, ids
