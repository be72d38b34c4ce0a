"""Geometric token-grid similarity (reference graph/utils.py:55-81).

``pairwise_point_sim(h, w)`` returns the [h*w, h*w] matrix
``1 / (1 + ||p_i - p_j||_pow / alpha)`` over the 2-D patch grid, row-major
(h, w) flattening — identical to the reference's meshgrid(indexing="ij") +
flatten + cdist. This is a compile-time constant for a fixed backbone, so it
folds into the jitted graph-building program.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


def pairwise_point_dist(h: int, w: int, pow: float = 2.0) -> jnp.ndarray:
    ii, jj = np.meshgrid(np.arange(h, dtype=np.float32), np.arange(w, dtype=np.float32), indexing="ij")
    p = np.stack([ii.reshape(-1), jj.reshape(-1)], axis=1)  # [h*w, 2]
    diff = np.abs(p[:, None, :] - p[None, :, :])
    # p-norm over the 2 coordinates (torch.cdist(p=pow))
    dist = (diff**pow).sum(-1) ** (1.0 / pow)
    return jnp.asarray(dist, dtype=jnp.float32)


@lru_cache(maxsize=16)
def _cached_sim(h: int, w: int, alpha: float, pow: float):
    assert alpha >= 0
    dist = np.asarray(pairwise_point_dist(h, w, pow)) / alpha
    return jnp.asarray(1.0 / (1.0 + dist), dtype=jnp.float32)


def pairwise_point_sim(h: int, w: int, alpha: float = 1.0, pow: float = 2.0) -> jnp.ndarray:
    return _cached_sim(int(h), int(w), float(alpha), float(pow))
