"""Determinism helpers (reference cv_lib ``make_deterministic``, used at
worker.py:320-323 with per-rank ``seed + rank``).

JAX is deterministic by construction (explicit PRNG keys); what needs seeding
is host-side numpy/python randomness (data order, augmentation params) and the
per-process offset for multi-host runs.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def make_deterministic(seed: int, per_process: bool = True) -> int:
    """Seed host RNGs; returns the effective (per-process-offset) seed to feed
    into jax.random.PRNGKey / the data loader."""
    eff = seed + (jax.process_index() if per_process else 0)
    random.seed(eff)
    np.random.seed(eff % (2**32))
    return eff
