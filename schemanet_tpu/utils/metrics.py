"""Host-side metric meters + top-k accuracy.

Re-creation of the cv_lib surface the reference depends on
(``cv_lib.metrics.AverageMeter/DictAverageMeter/accuracy``, used at reference
``schema_inference/eval/evaluation.py:63-97``). Cross-process ``sync()`` in the
reference is a torch.distributed all-reduce; under single-controller JAX every
host sees the full metric stream for its shard, so ``sync()`` sums across
processes with ``jax.experimental.multihost_utils`` only when world > 1.
"""

from __future__ import annotations

from typing import Dict, Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class AverageMeter:
    """Weighted running average with deferred accumulation like cv_lib's."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._sum = 0.0
        self._count = 0.0
        self._accumulated = None

    def update(self, value, n: int = 1):
        self._sum += float(value) * n
        self._count += n

    def accumulate(self):
        self._accumulated = (self._sum, self._count)

    def sync(self):
        if self._accumulated is None:
            self.accumulate()
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            arr = np.asarray(self._accumulated, dtype=np.float64)
            arr = multihost_utils.process_allgather(arr).sum(axis=0)
            self._accumulated = (float(arr[0]), float(arr[1]))

    def value(self) -> float:
        s, c = self._accumulated if self._accumulated is not None else (self._sum, self._count)
        return s / c if c > 0 else 0.0


class DictAverageMeter:
    def __init__(self):
        self._meters: Dict[str, AverageMeter] = {}

    def reset(self):
        self._meters.clear()

    def update(self, values: Dict[str, float], n: int = 1):
        for k, v in values.items():
            self._meters.setdefault(k, AverageMeter()).update(v, n)

    def accumulate(self):
        for m in self._meters.values():
            m.accumulate()

    def sync(self):
        for m in self._meters.values():
            m.sync()

    def value(self) -> Dict[str, float]:
        return {k: m.value() for k, m in self._meters.items()}


def topk_accuracy(
    logits: jnp.ndarray, labels: jnp.ndarray, top_k: Sequence[int] = (1,)
) -> Dict[int, jnp.ndarray]:
    """Top-k accuracy fractions in [0, 1] (reference cv_lib.metrics.accuracy)."""
    max_k = max(top_k)
    # [bs, max_k] indices of the top-k logits
    _, pred = jax.lax.top_k(logits, max_k)
    correct = pred == labels[:, None]
    return {k: jnp.mean(jnp.any(correct[:, :k], axis=1).astype(jnp.float32)) for k in top_k}


def tensor_dict_items(d: Dict[str, object], ndigits: int = 4) -> Dict[str, float]:
    """Round a dict of scalars/arrays to python floats (cv_lib.tensor_dict_items)."""
    return {k: round(float(v), ndigits) for k, v in d.items()}


def count_parameters(tree, include_frozen: bool = True) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))
