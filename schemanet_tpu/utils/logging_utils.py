"""Logging + TensorBoard setup.

The reference runs a dedicated listener process with QueueHandlers because
torch spawns one python process per GPU (``dist_engine.py:82``,
``worker.py:278-283``). Single-controller JAX has one python process per host,
so plain per-host logging suffices; only process 0 writes TensorBoard, matching
the reference's rank-0-only tb writer (``worker.py:176-183``).
"""

from __future__ import annotations

import logging
import os
import sys
import time
from typing import Optional

import jax


def setup_logger(
    log_dir: Optional[str] = None,
    filename: Optional[str] = None,
    level: int = logging.INFO,
    name: Optional[str] = None,
) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(level)
    fmt = logging.Formatter(
        f"%(asctime)s [p{jax.process_index()}] %(name)s %(levelname)s: %(message)s"
    )
    if not any(isinstance(h, logging.StreamHandler) for h in logger.handlers):
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(fmt)
        logger.addHandler(sh)
    if log_dir is not None:
        os.makedirs(log_dir, exist_ok=True)
        filename = filename or f"log-{time.strftime('%Y%m%d-%H%M%S')}.txt"
        path = os.path.join(log_dir, filename)
        if not any(
            isinstance(h, logging.FileHandler) and h.baseFilename == os.path.abspath(path)
            for h in logger.handlers
        ):
            fh = logging.FileHandler(path, mode="a")  # append on resume (dist_engine.py:26)
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    return logger


class TBWriter:
    """Rank-0-only TensorBoard writer; silently no-ops elsewhere/if unavailable."""

    def __init__(self, log_dir: Optional[str], enabled: bool = True):
        self._writer = None
        if enabled and log_dir is not None and jax.process_index() == 0:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._writer = SummaryWriter(log_dir=log_dir)
            except Exception:  # pragma: no cover - tb optional
                self._writer = None

    def add_scalar(self, tag: str, value, step: int):
        if self._writer is not None:
            self._writer.add_scalar(tag, float(value), step)

    def add_scalars(self, tag: str, values, step: int):
        if self._writer is not None:
            self._writer.add_scalars(tag, {k: float(v) for k, v in values.items()}, step)

    def flush(self):
        if self._writer is not None:
            self._writer.flush()

    def close(self):
        if self._writer is not None:
            self._writer.close()
