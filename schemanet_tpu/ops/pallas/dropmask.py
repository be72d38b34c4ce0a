"""Counter-based dropout masks shared by the fused Pallas kernels.

The round-3 kernels regenerated dropout masks in their backward passes with
the stateful TPU hardware PRNG (``pltpu.prng_seed`` + ``prng_random_bits``),
relying on the forward and backward kernels drawing bit-identical streams.
On real hardware that assumption failed: the on-chip validator
(tools/check_dropout_grad.py, round-3 campaign step [M]) measured a ~0.8
relative error between the analytic gradient and a fixed-seed finite
difference for BOTH the attention and the FFN kernel — the regenerated
backward mask did not match the forward mask (the stateful generator's
stream -> element mapping is a Mosaic layout/lowering detail, not a
contract), while per-kernel determinism held.

This module replaces the stateful draws with a stateless counter-based hash:
the keep decision for logical element (row, col) of stream ``stream`` under
``seed`` is a pure elementwise function of those integers (murmur3-style
finalizer over a linear counter). Two kernels that agree on the logical
indices agree on the mask bit-for-bit — regardless of block size, grid
shape, vector layout, or even backend (the same function runs under XLA,
Pallas interpret mode, and Mosaic), which also makes the dropout-live
gradient paths testable on CPU (tests/test_dropmask.py).

Quality: murmur3's 32-bit finalizer has full avalanche; the top 24 bits of
the hash give a uniform [0, 1) value, exactly like the previous
``prng_random_bits`` path. The reference's torch dropout stream differs from
any JAX stream anyway (parity is statistical, not bitwise — reference
layers/mlp.py dropout, mha.py:258-260).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_U = jnp.uint32


def _fmix32(h):
    """murmur3 32-bit finalizer (full avalanche), uint32 in / uint32 out."""
    h = h ^ (h >> _U(16))
    h = h * _U(0x85EBCA6B)
    h = h ^ (h >> _U(13))
    h = h * _U(0xC2B2AE35)
    h = h ^ (h >> _U(16))
    return h


def hash_keep_mask(seed, stream, shape, dropout_p, row_offset=0):
    """Bernoulli(1 - dropout_p) keep mask for a 2D block.

    seed:       int32 scalar (traced) — the training-step dropout seed.
    stream:     int32 scalar (traced or python int) — substream id, e.g.
                ``item * H + head`` for per-(item, head) attention masks.
    shape:      (rows, cols) of the block to mask.
    dropout_p:  python float in [0, 1).
    row_offset: absolute row of this block's first row within the stream —
                blocks of any size tile the same logical mask.

    Element (r, c) draws from ``fmix32(counter * C1 ^ h0)`` with
    ``counter = (row_offset + r) * cols + c`` and ``h0`` mixed from
    (seed, stream); the value at a logical element never depends on how the
    caller blocks the iteration space.
    """
    rows, cols = shape
    r = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    c = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    seed_u = jnp.asarray(seed, jnp.int32).astype(_U)
    stream_u = jnp.asarray(stream, jnp.int32).astype(_U)
    h0 = _fmix32(seed_u * _U(0x9E3779B1) ^ stream_u * _U(0x85EBCA77))
    off_u = jnp.asarray(row_offset, jnp.int32).astype(_U)
    counter = (r.astype(_U) + off_u) * _U(cols) + c.astype(_U)
    h = _fmix32(counter * _U(0xC2B2AE3D) ^ h0)
    # top 24 bits -> uniform [0, 1). uint32 >> 8 < 2**24 is value-exact as
    # int32 (Mosaic lowers no uint32 -> f32 cast, so go via int32).
    u = (h >> _U(8)).astype(jnp.int32).astype(jnp.float32) * (1.0 / 16777216.0)
    return u >= dropout_p
