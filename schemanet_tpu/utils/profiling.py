"""Tracing/profiling utilities (SURVEY §5.1: the reference has only wall-clock
timers and optional C++ chrono prints; on TPU we provide jax.profiler traces +
a step timer that reports images/sec)."""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Iterator, Optional

import jax

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture an XLA profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", log_dir)


class StepTimer:
    """Rolling throughput meter for the training loop."""

    def __init__(self, window: int = 50):
        self.window = window
        self.reset()

    def reset(self):
        self._t0: Optional[float] = None
        self._count = 0
        self._items = 0

    def step(self, n_items: int = 0):
        now = time.perf_counter()
        if self._t0 is None:
            self._t0 = now
            return None
        self._count += 1
        self._items += n_items
        if self._count >= self.window:
            dt = now - self._t0
            result = {
                "steps_per_sec": self._count / dt,
                "items_per_sec": self._items / dt,
            }
            self.reset()
            self._t0 = now
            return result
        return None


def block_tree(tree):
    """block_until_ready over a pytree (accurate timing boundaries)."""
    return jax.tree_util.tree_map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready") else a, tree
    )
