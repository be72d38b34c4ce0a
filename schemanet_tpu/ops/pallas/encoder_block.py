"""Whole-encoder-half fused Pallas kernels for the FROZEN forward path.

The round-3 profile of the CIFAR SchemaNet step attributed 65% of the step to
the frozen backbone forward, almost all HBM-bound: every encoder layer makes
~6 HBM round trips of the [bs*n, d] activation (LN1 -> qkv projection ->
attention -> out projection -> residual -> LN2 -> FFN -> residual), and the
qkv tensor (3x the activation) round-trips twice more. These two kernels
collapse a pre-norm encoder layer into exactly TWO HBM round trips:

* ``attn_block``:  y = x + (MHSA(LN1(x) @ Wqkv + bqkv) @ Wo + bo)
* ``ffn_block``:   z = y + (act(LN2(y) @ W1 + b1) @ W2 + b2)

Weights live in VMEM for the whole grid; per item the LN statistics, the qkv
tensor, the [n, n] score tiles, and the FFN hidden state never leave VMEM.

Forward-only BY DESIGN: the frozen-backbone consumers (SchemaNet training's
stop-gradient backbone, extraction, init, eval, serving) never differentiate
through the backbone, and gradient-carrying paths (stage-0 fine-tuning,
dropout-live calls) keep the per-op kernels with their recompute VJPs.
Gated by the policy's ``block`` field (ops/policy.py) inside
``models/transformer.py`` — engaged only when deterministic, un-probed,
mask-free, pre-norm, and unquantised.

Numerics match the XLA path op for op: LN statistics and scale/bias in fp32
(flax.linen.LayerNorm fast-variance semantics), matmuls accumulate fp32 on
the MXU and round once to the compute dtype, bias adds in the compute dtype
(flax Dense), q pre-scaled in its own dtype, softmax in fp32
(models/attention.py dot_product_attention; reference mha.py:253-257).
Parity pinned by tests/test_encoder_block.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_rows(x, scale_ref, bias_ref, eps):
    """fp32 LayerNorm of a [n, d] block, output cast to x.dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean, 0.0)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(jnp.float32)
    return y.astype(x.dtype)


def _dense(x, w_ref, b_ref):
    """flax Dense semantics: fp32 MXU accumulation rounded once to the
    compute dtype, bias added in the compute dtype."""
    y = jnp.dot(x, w_ref[...], preferred_element_type=jnp.float32).astype(x.dtype)
    return y + b_ref[...]


def _head_attn(qkv, h, H, d, scale):
    """One head's softmax(q k^T) v from the fused-projection lane layout.

    Returns (out, scores): the fp32 pre-softmax scaled scores are surfaced so
    ``attn_block`` can emit a head-mean capture without a second pass."""
    q = qkv[:, h * d : (h + 1) * d] * qkv.dtype.type(scale)
    k = qkv[:, (H + h) * d : (H + h + 1) * d]
    v = qkv[:, (2 * H + h) * d : (2 * H + h + 1) * d]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    attn = jax.nn.softmax(scores, axis=-1)
    return jnp.dot(attn.astype(v.dtype), v, preferred_element_type=jnp.float32), scores


def _paired_head_attn(qkv, h, H, d, scale):
    """TWO heads' attention in one 128-deep score matmul + one AV matmul.

    At head_dim 64 the per-head score matmul contracts only half the MXU's
    128-deep systolic array and the AV matmul fills only half its output
    lanes — the r04 profile pinned the attn-half kernels at 42 TFLOP/s vs 74
    on the FFN halves. Packing a head PAIR builds block-diagonal K/V panels

        k_bd = [[k_h, 0], [0, k_h1]]  (rows padded per head to a lane-aligned
        v_bd = [[v_h, 0], [0, v_h1]]   n_pad), q2 = [q_h | q_h1]

    so scores2 = q2 @ k_bd^T = [S_h | S_h1] lands in one [n, 2*n_pad]
    contraction of depth 2d=128, and P @ v_bd = [out_h | out_h1] emits both
    heads' outputs already concatenated. MXU cycles are THE SAME as the
    padded per-head path (the zero blocks cost what the depth/lane padding
    cost) — the candidate win is purely halving the serial per-head op chain
    (VERDICT r4 #6); measured on chip before any default flip.
    Numerics: identical op order per head (fp32 scores, fp32 softmax, low-
    precision AV with fp32 accumulation); padded columns are masked to -inf
    before the softmax so they contribute exp(-inf)=0.
    """
    n = qkv.shape[0]
    n_pad = -(-n // 128) * 128
    q2 = qkv[:, h * d : (h + 2) * d] * qkv.dtype.type(scale)  # [n, 2d]

    def _bd(a, b):
        # [[a, 0], [0, b]] with each block's rows padded to n_pad (static
        # concats only — Mosaic has no value dynamic_update_slice)
        z_col = jnp.zeros((n, d), qkv.dtype)
        parts = [jnp.concatenate([a, z_col], axis=1)]
        if n_pad != n:
            parts.append(jnp.zeros((n_pad - n, 2 * d), qkv.dtype))
        parts.append(jnp.concatenate([z_col, b], axis=1))
        if n_pad != n:
            parts.append(jnp.zeros((n_pad - n, 2 * d), qkv.dtype))
        return jnp.concatenate(parts, axis=0)

    k_bd = _bd(
        qkv[:, (H + h) * d : (H + h + 1) * d],
        qkv[:, (H + h + 1) * d : (H + h + 2) * d],
    )
    v_bd = _bd(
        qkv[:, (2 * H + h) * d : (2 * H + h + 1) * d],
        qkv[:, (2 * H + h + 1) * d : (2 * H + h + 2) * d],
    )
    raw = jax.lax.dot_general(
        q2, k_bd, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [n, 2*n_pad] = [S_h | S_h1] with padded key columns
    if n_pad != n:
        col = jax.lax.broadcasted_iota(jnp.int32, raw.shape, 1)
        scores = jnp.where(col % n_pad < n, raw, -jnp.inf)
    else:
        scores = raw
    # segmented softmax at the lane-aligned n_pad boundary (one per head)
    p1 = jax.nn.softmax(scores[:, :n_pad], axis=-1)
    p2 = jax.nn.softmax(scores[:, n_pad:], axis=-1)
    attn = jnp.concatenate([p1, p2], axis=-1).astype(qkv.dtype)
    # pre-mask raw slices = each head's pre-softmax scores (padded cols cut)
    raw2 = raw[:, :n] + raw[:, n_pad : n_pad + n]
    return jnp.dot(attn, v_bd, preferred_element_type=jnp.float32), raw2  # [n, 2d]


def _mhsa_rows(qkv, H, d, scale, out_dtype, pack, want_scores=False):
    """Concatenated per-head attention outputs; with ``want_scores`` also the
    fp32 SUM over heads of the pre-softmax scaled scores (for the head-mean
    capture — summed here so the [n, n] accumulator is the only extra VMEM)."""
    outs = []
    acc = None
    h = 0
    while h < H:
        if pack and h + 1 < H:
            out, scores = _paired_head_attn(qkv, h, H, d, scale)  # scores pre-summed
            h += 2
        else:
            out, scores = _head_attn(qkv, h, H, d, scale)
            h += 1
        outs.append(out.astype(out_dtype))
        if want_scores:
            acc = scores if acc is None else acc + scores
    return jnp.concatenate(outs, axis=-1), acc


def _attn_block_kernel(
    x_ref, g1_ref, be1_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, out_ref,
    *, num_heads, head_dim, scale, eps, pack=False,
):
    H, d = num_heads, head_dim
    for b in range(x_ref.shape[0]):
        xb = x_ref[b]  # [n, dim]
        qkv = _dense(_ln_rows(xb, g1_ref, be1_ref, eps), wqkv_ref, bqkv_ref)
        mh, _ = _mhsa_rows(qkv, H, d, scale, xb.dtype, pack)
        proj = _dense(mh, wo_ref, bo_ref)
        out_ref[b] = xb + proj


def _attn_block_hmean_kernel(
    x_ref, g1_ref, be1_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, out_ref, hm_ref,
    *, num_heads, head_dim, scale, eps, pack=False,
):
    """attn_block + head-mean of the pre-softmax scaled scores as a second
    output — the SchemaNet capture (predictor.py attn_mean) folded into the
    kernel so the capture layer keeps the fused path and the [bs, H, n, n]
    raw-attention HBM round trip shrinks to [bs, n, n]."""
    H, d = num_heads, head_dim
    for b in range(x_ref.shape[0]):
        xb = x_ref[b]  # [n, dim]
        qkv = _dense(_ln_rows(xb, g1_ref, be1_ref, eps), wqkv_ref, bqkv_ref)
        mh, score_sum = _mhsa_rows(qkv, H, d, scale, xb.dtype, pack, want_scores=True)
        proj = _dense(mh, wo_ref, bo_ref)
        out_ref[b] = xb + proj
        hm_ref[b] = (score_sum * (1.0 / H)).astype(hm_ref.dtype)


def _ffn_block_kernel(
    x_ref, g2_ref, be2_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
    *, eps, activation,
):
    from .mlp import _kernel_activation

    x = x_ref[...]  # [rows, d] (row-flattened like ops/pallas/mlp.py)
    h = _dense(_ln_rows(x, g2_ref, be2_ref, eps), w1_ref, b1_ref)
    h = _kernel_activation(activation)(h)
    out_ref[...] = x + _dense(h, w2_ref, b2_ref)


def _block_items(n, dim, three_hd, itemsize) -> int:
    """Items per program for the attention half: the per-item transients
    (bf16 qkv + two fp32 [n, n] score tiles per live head) dominate; keep the
    double-buffered io blocks around the same budget as the flash kernel."""
    budget = int(os.environ.get("SCHEMANET_BLOCK_FWD_BUDGET", 2_000_000))
    return max(1, min(8, budget // (n * three_hd * itemsize)))


def attn_block(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo, num_heads,
               eps=1e-6, interpret=False, pack=None, capture_hmean=False):
    """x + MHSA-half of a pre-norm encoder layer. [bs, n, dim] -> same.

    ``pack`` (None = policy ``attn_pack``): pair-pack head_dim-64 heads into
    128-deep MXU matmuls (see _paired_head_attn). Only engaged at d == 64.

    ``capture_hmean``: also return the head-mean of the PRE-softmax scaled
    scores ([bs, n, n], fp32-accumulated, emitted in x.dtype) — the
    SchemaNet graph-build capture (schema/predictor.py). Folding it into the
    kernel lets the capture layer keep the fused path instead of falling back
    to the plain XLA attention just to surface [bs, H, n, n] raw scores."""
    bs, n, dim = x.shape
    three_hd = wqkv.shape[1]
    d = three_hd // (3 * num_heads)
    if pack is None:
        from ..policy import resolve

        pack = resolve("attn_pack") == "pair"
    pack = bool(pack) and d == 64 and num_heads >= 2
    blk = _block_items(n, dim, three_hd, x.dtype.itemsize)
    # operands in the compute dtype like flax Dense / the surrounding model
    wqkv, bqkv, wo, bo = (a.astype(x.dtype) for a in (wqkv, bqkv, wo, bo))
    kernel = _attn_block_hmean_kernel if capture_hmean else _attn_block_kernel
    out_specs = pl.BlockSpec((blk, n, dim), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((bs, n, dim), x.dtype)
    if capture_hmean:
        out_specs = [
            out_specs,
            pl.BlockSpec((blk, n, n), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ]
        out_shape = [out_shape, jax.ShapeDtypeStruct((bs, n, n), x.dtype)]
    result = pl.pallas_call(
        functools.partial(
            kernel,
            num_heads=num_heads, head_dim=d, scale=1.0 / (d ** 0.5), eps=float(eps),
            pack=pack,
        ),
        grid=(pl.cdiv(bs, blk),),
        in_specs=[
            pl.BlockSpec((blk, n, dim), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dim,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((dim,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, three_hd), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((three_hd,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((num_heads * d, dim), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dim,), lambda b: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            # qkv + out projections + the per-head score/value matmuls
            flops=2 * bs * n * dim * three_hd
            + 2 * bs * n * num_heads * d * dim
            + 2 * 2 * bs * num_heads * n * n * d,
            bytes_accessed=2 * x.size * x.dtype.itemsize
            + (wqkv.size + wo.size) * x.dtype.itemsize
            + (bs * n * n * x.dtype.itemsize if capture_hmean else 0),
            transcendentals=bs * num_heads * n * n + bs * n,
        ),
        interpret=interpret,
    )(x, ln_scale, ln_bias, wqkv, bqkv, wo, bo)
    return result


def _ffn_rows(f: int, itemsize: int) -> int:
    budget = int(os.environ.get("SCHEMANET_BLOCK_FFN_BUDGET", 2_500_000))
    return max(256, min(2048, (budget // (f * itemsize)) // 256 * 256))


def ffn_block(x, ln_scale, ln_bias, w1, b1, w2, b2, activation="gelu",
              eps=1e-6, interpret=False):
    """x + FFN-half of a pre-norm encoder layer. [bs, n, d] -> same."""
    bs, n, dim = x.shape
    f = w1.shape[1]
    rows = _ffn_rows(f, x.dtype.itemsize)
    w1, b1, w2, b2 = (a.astype(x.dtype) for a in (w1, b1, w2, b2))
    xr = x.reshape(bs * n, dim)  # free bitcast
    out = pl.pallas_call(
        functools.partial(_ffn_block_kernel, eps=float(eps), activation=activation),
        grid=(pl.cdiv(bs * n, rows),),
        in_specs=[
            pl.BlockSpec((rows, dim), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dim,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((dim,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, f), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((f,), lambda b: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((f, dim), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dim,), lambda b: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, dim), lambda b: (b, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bs * n, dim), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bs * n * dim * f,
            bytes_accessed=2 * x.size * x.dtype.itemsize
            + (w1.size + w2.size) * x.dtype.itemsize,
            transcendentals=bs * n * f + bs * n,
        ),
        interpret=interpret,
    )(xr, ln_scale, ln_bias, w1, b1, w2, b2)
    return out.reshape(bs, n, dim)


def block_backend() -> str:
    """'pallas' | 'interpret' | 'xla'(= off) — the policy's ``block`` field."""
    from ..policy import resolve

    return resolve("block")
