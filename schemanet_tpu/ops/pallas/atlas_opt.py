"""Fused AdamW + atlas-projection Pallas kernel for the IR-Atlas tensors.

The SchemaNet step pays two full HBM sweeps over the atlas every iteration:
the AdamW update (read p/g/m/v, write p/m/v — XLA fuses this well) and the
no-grad ``normalize()`` projection (reference schema_net.py:133-142; here
``schema.atlas.project_atlas_params``) that re-reads and re-writes the fresh
params. At CIFAR scale the edge tensor is [100, 1024, 1024] fp32 (420 MB);
at ImageNet scale [1000, 500, 500] (1 GB) — the projection pass alone is
~1-3 ms of pure bandwidth.

Both are row-local (Adam is elementwise; the projection is clamp-min +
row-sum-normalise over the last axis), so one Pallas pass does update AND
projection: read p/g/m/v once, write p/m/v once, with the row statistics in
VMEM. Outputs alias inputs (``input_output_aliases``), matching the donated
train-step buffers.

Ordering equivalence: the reference projects before every train step and the
gradient is taken at the projected point (worker_schema_net.py:127). Folding
the projection into the *previous* step's optimizer instead (project once
before step 0, then update+project each step) presents the gradient with the
identical projected parameters — the sequence of (projected params, grads,
Adam moments) is unchanged, only where the projection executes moves.
Numerical parity vs ``optax.adamw`` + ``project_atlas_params`` is pinned by
tests/test_atlas_opt.py.

AdamW semantics match ``optax.adamw(lr, b1, b2, eps, weight_decay)`` exactly:
``m = b1·m + (1-b1)·g``; ``v = b2·v + (1-b2)·g²``; bias-corrected with the
*incremented* count; ``p ← p − lr·(m̂/(√v̂+eps) + wd·p)``. The projection is
``w = max(p, 0); w/Σw`` with all-zero rows mapping to 0 (the 0/0 →
``nan_to_num(0)`` convention of graph/utils.py:25-34), then the diagonal is
zeroed when ``remove_self_loop`` (applies to [K,V,V] edge tensors viewed as
[K·V, V] rows: the diagonal column of row r is ``r mod V``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# fp32 bytes one [rows, C] operand block may occupy; the kernel holds 4 input
# + 3 aliased output blocks plus a couple of temps, so ~9x this in VMEM.
_BLOCK_BYTES = 1_000_000


def _row_block(n_rows: int, c: int) -> int:
    cap = max(8, _BLOCK_BYTES // (c * 4))
    best = 0
    for b in range(8, min(n_rows, cap) + 1, 8):
        if n_rows % b == 0:
            best = b
    if best:
        return best
    for b in range(min(n_rows, cap), 0, -1):
        if n_rows % b == 0:
            return b
    return n_rows


def _kernel(
    scal_ref, p_ref, g_ref, m_ref, v_ref, p_out, m_out, v_out,
    *, b1, b2, eps, wd, project, self_loop_v, rows,
):
    lr = scal_ref[0]
    bc1 = scal_ref[1]  # 1 / (1 - b1^t)
    bc2 = scal_ref[2]  # 1 / (1 - b2^t)
    g = g_ref[...]
    p = p_ref[...]
    m = b1 * m_ref[...] + (1.0 - b1) * g
    v = b2 * v_ref[...] + (1.0 - b2) * g * g
    upd = (m * bc1) / (jnp.sqrt(v * bc2) + eps) + wd * p
    pn = p - lr * upd
    if project:
        w = jnp.maximum(pn, 0.0)
        s = jnp.sum(w, axis=-1, keepdims=True)
        pn = jnp.where(s > 0.0, w / s, 0.0)
    if self_loop_v is not None:
        # row r of the flattened [K·V, V] edge view has its self-loop at
        # column r mod V (project_atlas_params zeroes it after normalising)
        r0 = pl.program_id(0) * rows
        rid = r0 + jax.lax.broadcasted_iota(jnp.int32, pn.shape, 0)
        cid = jax.lax.broadcasted_iota(jnp.int32, pn.shape, 1)
        pn = jnp.where(cid == rid % self_loop_v, 0.0, pn)
    p_out[...] = pn
    m_out[...] = m
    v_out[...] = v


def adamw_project_rows(
    p: jnp.ndarray,
    g: jnp.ndarray,
    m: jnp.ndarray,
    v: jnp.ndarray,
    count: jnp.ndarray,
    *,
    lr,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 1e-4,
    project: bool = True,
    remove_self_loop: bool = False,
    interpret: bool = False,
):
    """One fused AdamW step + row projection over the last axis.

    ``p/g/m/v`` share any shape ``[..., C]`` (fp32); ``count`` is the number
    of updates already applied (optax's pre-increment convention). For 3-D
    ``[K, V, V]`` inputs with ``remove_self_loop`` the diagonal of each
    ``[V, V]`` block is zeroed after normalisation. Returns ``(p, m, v)``.
    """
    shape = p.shape
    c = shape[-1]
    n = p.size // c
    t = (count + 1).astype(jnp.float32)
    scal = jnp.stack(
        [
            jnp.asarray(lr, jnp.float32),
            1.0 / (1.0 - jnp.asarray(b1, jnp.float32) ** t),
            1.0 / (1.0 - jnp.asarray(b2, jnp.float32) ** t),
        ]
    )
    self_loop_v = None
    if remove_self_loop:
        if len(shape) < 2 or shape[-2] != c:
            raise ValueError(f"remove_self_loop needs [..., V, V], got {shape}")
        self_loop_v = c
    rows = _row_block(n, c)
    view = (n, c)
    out = pl.pallas_call(
        functools.partial(
            _kernel, b1=b1, b2=b2, eps=eps, wd=weight_decay,
            project=project, self_loop_v=self_loop_v, rows=rows,
        ),
        grid=(pl.cdiv(n, rows),),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((rows, c), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, c), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, c), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, c), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rows, c), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, c), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, c), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct(view, jnp.float32)] * 3,
        # update in place: p/m/v are donated train-step buffers
        input_output_aliases={1: 0, 3: 1, 4: 2},
        cost_estimate=pl.CostEstimate(
            flops=12 * n * c,
            bytes_accessed=7 * n * c * 4,
            transcendentals=n * c,
        ),
        interpret=interpret,
    )(
        scal,
        p.reshape(view),
        g.reshape(view),
        m.reshape(view),
        v.reshape(view),
    )
    return tuple(x.reshape(shape) for x in out)
