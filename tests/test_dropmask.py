"""Dropout correctness for the fused kernels (ops/pallas/dropmask.py).

The hash mask is a pure function of (seed, stream, row, col), so every
property that previously required real hardware (tools/check_dropout_grad.py)
is testable here in interpret mode: block invariance, determinism, mean
preservation, and — the one the stateful PRNG scheme failed on-chip — the
fixed-seed finite-difference gradient through a dropout-live kernel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from schemanet_tpu.ops.pallas.dropmask import hash_keep_mask
from schemanet_tpu.ops.pallas.attention import fused_mhsa
from schemanet_tpu.ops.pallas.mlp import fused_mlp


def test_block_invariance():
    """Blocks of any size at any row offset tile the same logical mask."""
    p, seed, stream = 0.3, 1234, 5
    full = np.asarray(hash_keep_mask(seed, stream, (64, 96), p))
    for rows in (8, 16, 32):
        tiles = [
            np.asarray(hash_keep_mask(seed, stream, (rows, 96), p, row_offset=r0))
            for r0 in range(0, 64, rows)
        ]
        np.testing.assert_array_equal(np.concatenate(tiles, axis=0), full)


def test_stream_and_seed_independence():
    p = 0.5
    a = np.asarray(hash_keep_mask(7, 0, (32, 128), p))
    b = np.asarray(hash_keep_mask(7, 1, (32, 128), p))
    c = np.asarray(hash_keep_mask(8, 0, (32, 128), p))
    assert (a != b).mean() > 0.3  # distinct streams decorrelate
    assert (a != c).mean() > 0.3  # distinct seeds decorrelate
    np.testing.assert_array_equal(a, np.asarray(hash_keep_mask(7, 0, (32, 128), p)))


def test_keep_rate():
    for p in (0.1, 0.5, 0.9):
        keep = np.asarray(hash_keep_mask(3, 11, (256, 256), p))
        assert abs(keep.mean() - (1 - p)) < 0.01, (p, keep.mean())


def _fd_check(f, x, eps=0.02, tol=2e-2):
    """Central finite difference along a random direction vs <grad, v>."""
    g = jax.grad(f)(x)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=x.shape).astype(np.float32))
    v = v / jnp.linalg.norm(v)
    fd = (float(f(x + eps * v)) - float(f(x - eps * v))) / (2 * eps)
    an = float(jnp.vdot(g, v))
    rel = abs(fd - an) / max(abs(fd), abs(an), 1e-9)
    assert rel < tol, f"finite-diff {fd} vs <grad,v> {an} (rel {rel:.2e})"


def test_attention_dropout_gradient_interpret():
    """Fixed-seed FD gradient through the dropout-live attention kernel —
    the exact check the stateful-PRNG version failed on chip ([M] round 3)."""
    H, d, n, bs, p = 2, 8, 24, 4, 0.1
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(bs, n, 3 * H * d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(bs, n, H * d)).astype(np.float32))

    def f(qkv):
        return jnp.sum(fused_mhsa(qkv, H, dropout_p=p, seed=123, interpret=True) * w)

    o1 = float(f(x))
    o2 = float(f(x))
    assert o1 == o2  # determinism
    _fd_check(f, x)


def test_mlp_dropout_gradient_interpret():
    d, f_dim, n, bs, p = 16, 64, 24, 4, 0.1
    rng = np.random.default_rng(2)
    w1 = jnp.asarray(rng.normal(size=(d, f_dim)).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.normal(size=(f_dim,)).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.normal(size=(f_dim, d)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.normal(size=(d,)).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.normal(size=(bs, n, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(bs, n, d)).astype(np.float32))

    def f(xx):
        return jnp.sum(
            fused_mlp(xx, w1, b1, w2, b2, dropout_p=p, seed=7, interpret=True) * w
        )

    assert float(f(x)) == float(f(x))
    _fd_check(f, x)


def test_mlp_dropout_mean_preserving_interpret():
    """E[dropout(h)] == h: averaging over seeds approaches the dropout-free
    output (inverted scaling)."""
    d, f_dim, n, bs, p = 16, 64, 16, 2, 0.2
    rng = np.random.default_rng(3)
    w1 = jnp.asarray(rng.normal(size=(d, f_dim)).astype(np.float32) * 0.1)
    b1 = jnp.zeros((f_dim,), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(f_dim, d)).astype(np.float32) * 0.1)
    b2 = jnp.zeros((d,), jnp.float32)
    x = jnp.asarray(rng.normal(size=(bs, n, d)).astype(np.float32))

    base = float(jnp.sum(fused_mlp(x, w1, b1, w2, b2, interpret=True)))
    dropped = np.mean(
        [
            float(jnp.sum(fused_mlp(x, w1, b1, w2, b2, dropout_p=p, seed=s, interpret=True)))
            for s in range(40)
        ]
    )
    assert abs(dropped - base) / max(abs(base), 1e-9) < 0.05


def test_attention_dropout_xla_vs_interpret_agree():
    """The hash mask is backend-independent: the interpret-mode kernel and a
    pure-jnp oracle built from the same mask function agree exactly."""
    H, d, n, bs, p = 2, 8, 16, 2, 0.25
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(bs, n, 3 * H * d)).astype(np.float32))

    out = fused_mhsa(x, H, dropout_p=p, seed=55, interpret=True)

    # oracle: same math + same per-(item, head) streams in plain jnp
    scale = 1.0 / (d ** 0.5)
    outs = []
    for b in range(bs):
        heads = []
        for h in range(H):
            q = x[b, :, h * d : (h + 1) * d] * scale
            k = x[b, :, (H + h) * d : (H + h + 1) * d]
            v = x[b, :, (2 * H + h) * d : (2 * H + h + 1) * d]
            s = jax.nn.softmax(q @ k.T, axis=-1)
            keep = hash_keep_mask(55, b * H + h, s.shape, p)
            s = jnp.where(keep, s / (1 - p), 0.0)
            heads.append(s @ v)
        outs.append(jnp.concatenate(heads, axis=-1))
    oracle = jnp.stack(outs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(oracle), rtol=2e-5, atol=2e-5)
