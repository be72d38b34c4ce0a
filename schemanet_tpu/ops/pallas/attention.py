"""Fused Pallas multi-head self-attention (forward-only flash attention).

The XLA path (models/attention.py ``dot_product_attention``) materialises the
[bs, H, n, n] score tensor in HBM twice (raw logits + softmax), plus the
qkv moveaxis/slice layout copies around it — profiled together at ~20% of the
SchemaNet train step (the frozen ViT forward dominates the step, and these
memory ops dominate the frozen forward). This kernel computes one (batch,
head) attention block entirely in VMEM: scores, softmax and the value matmul
never touch HBM, and the fused qkv projection output is consumed in its
natural [bs, n, 3, H, d] layout so the surrounding transposes disappear.

Forward-only by design: it serves the *frozen* backbone path (the predictor
wraps backbone outputs in stop_gradient, reference loads no-grad TorchScript
traces — ``graph/__init__.py:39-40``), so no VJP is needed; stage-0 backbone
training keeps the differentiable XLA path.

Numerics match the XLA path: q pre-scaled in its own dtype, scores accumulated
fp32 on the MXU, softmax in fp32, attention cast back to the value dtype for
the output matmul (fp32 accumulation).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mhsa_kernel(qkv_ref, out_ref, *, num_heads, head_dim, scale):
    # a block of batch items per program: each item's [n, 3*H*d] qkv rows sit
    # in VMEM; items and heads are static python loops with static lane
    # slices (the TPU block-shape rule only constrains the last two dims, so
    # the natural [.., (3, H, d)] lane layout of the fused projection is
    # kept — no moveaxis/slice copies ever materialise in HBM). Multiple
    # items per program amortise the per-program DMA setup, which at one
    # item per program measured ~1.5 us x bs — the kernel's dominant cost
    # at bs=1024.
    H, d = num_heads, head_dim
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
            attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
            out = jnp.dot(attn, v, preferred_element_type=jnp.float32)
            outs.append(out.astype(out_ref.dtype))
        out_ref[b] = jnp.concatenate(outs, axis=-1)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def fused_mhsa(
    qkv: jnp.ndarray,  # [bs, n, 3 * H * d] — raw fused-projection output
    num_heads: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Softmax(q k^T / sqrt(d)) v for every head; returns [bs, n, H * d].

    ``qkv`` is the untouched output of the fused linear_qkv projection
    (layout [.., (3, H, d)] on the last axis, reference mha.py:195-236).
    """
    bs, n, three_hd = qkv.shape
    d = three_hd // (3 * num_heads)
    scale = 1.0 / (d**0.5)
    # items per program: keep the qkv block ~2 MB (scoped-vmem budget with
    # double buffering); a partial trailing block is clipped by Pallas
    blk = max(1, min(8, 2_000_000 // (n * three_hd * qkv.dtype.itemsize)))

    return pl.pallas_call(
        functools.partial(
            _mhsa_kernel, num_heads=num_heads, head_dim=d, scale=scale
        ),
        grid=(pl.cdiv(bs, blk),),
        in_specs=[
            pl.BlockSpec((blk, n, three_hd), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
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
    )(qkv)


def attention_backend() -> str:
    """'pallas' | 'interpret' | 'xla' — resolution of SCHEMANET_ATTN_BACKEND.

    'auto' (default) picks the fused kernel on TPU-like platforms and the
    plain XLA path elsewhere (the kernel compiles only for TPU; 'interpret'
    exists so CPU tests can exercise the integration end to end).
    """
    mode = os.environ.get("SCHEMANET_ATTN_BACKEND", "auto")
    if mode == "auto":
        try:
            platform = jax.devices()[0].platform
        except Exception:
            platform = "cpu"
        return "pallas" if platform in ("tpu", "axon") else "xla"
    return mode
