"""Fused Pallas multi-head self-attention — forward AND backward.

The XLA path (models/attention.py ``dot_product_attention``) materialises the
[bs, H, n, n] score tensor in HBM twice (raw logits + softmax), plus the
qkv moveaxis/slice layout copies around it — profiled together at ~20% of the
SchemaNet train step, and in *training* the same tensors materialise again in
the backward pass (the round-2 stage-0 fine-tune measured ~8% MFU because of
it). This kernel computes one (batch-block, head) attention entirely in VMEM:
scores, softmax and the value matmul never touch HBM, and the fused qkv
projection output is consumed in its natural [bs, n, (3, H, d)] lane layout so
the surrounding transposes disappear.

Differentiable via ``jax.custom_vjp``: the backward kernel recomputes scores/
softmax from the saved qkv (flash-attention style two-pass recompute — the
only residual is qkv itself, which the surrounding autodiff already keeps for
the qkv-projection VJP, so attention adds ZERO saved activations) and forms
dqkv in the same fused lane layout. Sequence lengths here (n<=198) fit whole
[n, n] score tiles in VMEM, so no online-softmax streaming is needed — this is
the single-tile degenerate case of the standard flash backward.

Attention dropout (reference mha.py:258-260) runs INSIDE the kernel via the
stateless counter-based hash mask (ops/pallas/dropmask.py): the keep bit is a
pure function of (seed, item, head, row, col), so the backward pass recomputes
bit-identical masks instead of storing an [bs, H, n, n] mask tensor — stable
across block sizes, kernels, and backends (the stateful pltpu.prng_* draws it
replaced were NOT: see dropmask.py). The stream differs from
``jax.random.bernoulli`` by design (documented; the reference's torch dropout
stream differs from JAX's anyway).

Numerics match the XLA path: q pre-scaled in its own dtype, scores accumulated
fp32 on the MXU, softmax in fp32, attention cast back to the value dtype for
the output matmul (fp32 accumulation). Gradient parity vs the XLA path is
asserted by tests/test_pallas_attention.py.
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


def _mhsa_kernel(
    seed_ref, qkv_ref, out_ref, *, num_heads, head_dim, scale, dropout_p, blk
):
    # a block of batch items per program: each item's [n, 3*H*d] qkv rows sit
    # in VMEM; items and heads are static python loops with static lane
    # slices (the TPU block-shape rule only constrains the last two dims, so
    # the natural [.., (3, H, d)] lane layout of the fused projection is
    # kept — no moveaxis/slice copies ever materialise in HBM). Multiple
    # items per program amortise the per-program DMA setup, which at one
    # item per program measured ~1.5 us x bs — the kernel's dominant cost
    # at bs=1024.
    H, d = num_heads, head_dim
    pid = pl.program_id(0)
    for b in range(qkv_ref.shape[0]):
        x = qkv_ref[b]  # [n, 3*H*d]
        outs = []
        for h in range(H):
            q = x[:, h * d : (h + 1) * d] * x.dtype.type(scale)
            k = x[:, (H + h) * d : (H + h + 1) * d]
            v = x[:, (2 * H + h) * d : (2 * H + h + 1) * d]
            # [n, n] scores; contract the feature axis of both (no transpose)
            scores = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            attn = jax.nn.softmax(scores, axis=-1)
            if dropout_p:
                # unique stream per (global item, head); the backward kernel
                # recomputes the identical stateless hash mask
                stream = (pid * blk + b) * H + h
                keep = hash_keep_mask(seed_ref[0], stream, attn.shape, dropout_p)
                attn = jnp.where(keep, attn * (1.0 / (1.0 - dropout_p)), 0.0)
            out = jnp.dot(
                attn.astype(v.dtype), v, preferred_element_type=jnp.float32
            )
            outs.append(out.astype(out_ref.dtype))
        out_ref[b] = jnp.concatenate(outs, axis=-1)


def _mhsa_bwd_kernel(
    seed_ref, qkv_ref, g_ref, dqkv_ref, *, num_heads, head_dim, scale, dropout_p, blk
):
    """dqkv from (qkv, dout): recompute scores/softmax (+ the identical
    dropout mask), then the standard softmax/matmul VJP chain — everything
    stays in VMEM, nothing [n, n]-shaped ever reaches HBM."""
    H, d = num_heads, head_dim
    pid = pl.program_id(0)
    for b in range(qkv_ref.shape[0]):
        x = qkv_ref[b]  # [n, 3*H*d]
        g = g_ref[b]  # [n, H*d]
        parts_q, parts_k, parts_v = [], [], []
        for h in range(H):
            q_s = x[:, h * d : (h + 1) * d] * x.dtype.type(scale)
            k = x[:, (H + h) * d : (H + h + 1) * d]
            v = x[:, (2 * H + h) * d : (2 * H + h + 1) * d]
            g_h = g[:, h * d : (h + 1) * d]
            scores = jax.lax.dot_general(
                q_s, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            s = jax.nn.softmax(scores, axis=-1)  # fp32 [n, n]
            if dropout_p:
                stream = (pid * blk + b) * H + h
                keep = hash_keep_mask(seed_ref[0], stream, s.shape, dropout_p)
                inv = 1.0 / (1.0 - dropout_p)
                attn_used = jnp.where(keep, s * inv, 0.0)
            else:
                attn_used = s
            a_lp = attn_used.astype(v.dtype)  # fwd casts attn before the matmul
            # dv[j] = sum_i attn_used[i, j] g[i]  (contract the query axis)
            dv = jax.lax.dot_general(
                a_lp, g_h, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            # dattn_used[i, j] = g[i] . v[j]
            dattn_used = jax.lax.dot_general(
                g_h, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            if dropout_p:
                dattn = jnp.where(keep, dattn_used * inv, 0.0)
            else:
                dattn = dattn_used
            # softmax VJP: ds = s * (dattn - sum_j dattn * s)
            ds = s * (dattn - jnp.sum(dattn * s, axis=-1, keepdims=True))
            ds_lp = ds.astype(x.dtype)
            # dq = (ds @ k) * scale ; dk[j] = sum_i ds[i, j] q_s[i]
            dq = jax.lax.dot_general(
                ds_lp, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            ) * jnp.float32(scale)
            dk = jax.lax.dot_general(
                ds_lp, q_s, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            parts_q.append(dq.astype(dqkv_ref.dtype))
            parts_k.append(dk.astype(dqkv_ref.dtype))
            parts_v.append(dv.astype(dqkv_ref.dtype))
        dqkv_ref[b] = jnp.concatenate(parts_q + parts_k + parts_v, axis=-1)


def _block_items(n, three_hd, itemsize, budget=2_000_000):
    # items per program: keep the qkv block ~2 MB (scoped-vmem budget with
    # double buffering); a partial trailing block is clipped by Pallas
    return max(1, min(8, budget // (n * three_hd * itemsize)))


def _mhsa_call(qkv, seed, num_heads, dropout_p, interpret):
    bs, n, three_hd = qkv.shape
    d = three_hd // (3 * num_heads)
    scale = 1.0 / (d**0.5)
    blk = _block_items(
        n,
        three_hd,
        qkv.dtype.itemsize,
        budget=int(os.environ.get("SCHEMANET_ATTN_FWD_BUDGET", 2_000_000)),
    )
    return pl.pallas_call(
        functools.partial(
            _mhsa_kernel,
            num_heads=num_heads,
            head_dim=d,
            scale=scale,
            dropout_p=dropout_p,
            blk=blk,
        ),
        grid=(pl.cdiv(bs, blk),),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((blk, n, three_hd), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (blk, n, num_heads * d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bs, n, num_heads * d), qkv.dtype),
        # scheduler hint + keeps XLA cost_analysis (bench MFU) honest about
        # the attention FLOPs that now live inside the kernel
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bs * num_heads * n * n * d,
            bytes_accessed=qkv.size * qkv.dtype.itemsize * 4 // 3,
            transcendentals=bs * num_heads * n * n,
        ),
        interpret=interpret,
    )(seed, qkv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _mhsa(qkv, seed, num_heads, dropout_p, interpret):
    return _mhsa_call(qkv, seed, num_heads, dropout_p, interpret)


def _mhsa_fwd(qkv, seed, num_heads, dropout_p, interpret):
    return _mhsa_call(qkv, seed, num_heads, dropout_p, interpret), (qkv, seed)


def _mhsa_bwd(num_heads, dropout_p, interpret, res, g):
    qkv, seed = res
    bs, n, three_hd = qkv.shape
    d = three_hd // (3 * num_heads)
    scale = 1.0 / (d**0.5)
    # backward holds ~4 fp32 [n, n] temps per head on top of the io blocks.
    # Swept on-chip in the full stage-0 train step (DeiT-Tiny bs=256):
    # budget 1.2M (blk=5) 67.5 ms, 900k (blk=4) 65.5, 500k (blk=2) 65.2,
    # 250k (blk=1) 65.9 — small blocks pipeline better against the serial
    # per-(item, head) matmul chains; 500k ships.
    blk = _block_items(
        n,
        three_hd,
        qkv.dtype.itemsize,
        budget=int(os.environ.get("SCHEMANET_ATTN_BWD_BUDGET", 500_000)),
    )
    dqkv = pl.pallas_call(
        functools.partial(
            _mhsa_bwd_kernel,
            num_heads=num_heads,
            head_dim=d,
            scale=scale,
            dropout_p=dropout_p,
            blk=blk,
        ),
        grid=(pl.cdiv(bs, blk),),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((blk, n, three_hd), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (blk, n, num_heads * d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (blk, n, three_hd), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bs, n, three_hd), qkv.dtype),
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * bs * num_heads * n * n * d,
            bytes_accessed=2 * qkv.size * qkv.dtype.itemsize,
            transcendentals=bs * num_heads * n * n,
        ),
        interpret=interpret,
    )(seed, qkv, g)
    return dqkv, np.zeros(seed.shape, jax.dtypes.float0)


_mhsa.defvjp(_mhsa_fwd, _mhsa_bwd)

_ZERO_SEED = None


def fused_mhsa(
    qkv: jnp.ndarray,  # [bs, n, 3 * H * d] — raw fused-projection output
    num_heads: int,
    interpret: bool = False,
    dropout_p: float = 0.0,
    seed: jnp.ndarray | None = None,  # int32 scalar; required when dropout_p > 0
) -> jnp.ndarray:
    """Softmax(q k^T / sqrt(d)) v for every head; returns [bs, n, H * d].

    ``qkv`` is the untouched output of the fused linear_qkv projection
    (layout [.., (3, H, d)] on the last axis, reference mha.py:195-236).
    Fully differentiable (flash-style recompute backward); with
    ``dropout_p > 0`` the in-kernel PRNG applies attention dropout keyed on
    ``seed`` (same mask regenerated in the backward pass).
    """
    if seed is None:
        assert not dropout_p, "dropout requires a seed"
        seed = jnp.zeros((1,), jnp.int32)
    else:
        seed = jnp.asarray(seed, jnp.int32).reshape((1,))
    return _mhsa(qkv, seed, num_heads, float(dropout_p), interpret)


def attention_backend() -> str:
    """'pallas' | 'interpret' | 'xla' — the policy's ``attn`` field.

    Tuned default is the fused kernel on TPU ([X1]: falling back to XLA cost
    97.6 -> 124.1 ms at the CIFAR SchemaNet step) and the plain XLA path
    elsewhere ('interpret' exists so CPU tests can exercise the integration
    end to end). See ops/policy.py.
    """
    from ..policy import resolve

    return resolve("attn")
