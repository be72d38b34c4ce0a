"""Standalone evaluation loops (reference ``schema_inference/eval/evaluation.py``).

* ``Evaluation`` — loss + top-k accuracy over a loader (distributed reduction
  handled by the jitted step's shardings + host allgather).
* ``CBEvaluation`` — the codebook agreement metric: run the backbone twice per
  batch with discretization deactivated/activated; report ``acc`` (quantised
  correct), ``acc_model`` (quantised prediction == original prediction),
  ``acc_origin`` (original correct) (evaluation.py:107-216).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import put_local_batch
from ..schema.loss import weighted_total


class Evaluation:
    def __init__(
        self,
        apply_fn: Callable,  # (params, buffers, image, train=False) -> output
        loss_fn: Callable,
        loss_weights: Dict[str, float],
        val_loader,
        batch_sharding=None,
        top_k: Sequence[int] = (1,),
    ):
        self.loss_fn = loss_fn
        self.loss_weights = dict(loss_weights)
        self.val_loader = val_loader
        self.top_k = tuple(top_k)
        self.batch_sharding = batch_sharding

        def step(params, buffers, batch):
            out = apply_fn(params, buffers, batch["image"], False)
            loss_dict = self.loss_fn(out, {"label": batch["label"]})
            total = weighted_total(loss_dict, self.loss_weights)
            pred = out["pred"]["pred"] if isinstance(out["pred"], dict) else out["pred"]
            valid = batch.get("valid", jnp.ones(pred.shape[0], jnp.float32))
            max_k = min(max(self.top_k), pred.shape[-1])
            _, top_pred = jax.lax.top_k(pred, max_k)
            correct = (top_pred == batch["label"][:, None]).astype(jnp.float32)
            accs = {
                k: jnp.sum(jnp.max(correct[:, : min(k, max_k)], axis=1) * valid)
                for k in self.top_k
            }
            return {"loss": total, "loss_dict": loss_dict, "acc_counts": accs,
                    "n": jnp.sum(valid)}

        self._step = jax.jit(step)

    def __call__(self, params, buffers=None) -> Dict[str, Any]:
        buffers = buffers if buffers is not None else {}
        # device-side accumulation, single host fetch per evaluation (avoids a
        # forced device->host sync per batch)
        acc = None
        for batch in self.val_loader:
            if self.batch_sharding is not None:
                batch = {k: put_local_batch(v, self.batch_sharding) for k, v in batch.items()}
            out = self._step(params, buffers, batch)
            n = out["n"]
            contrib = {
                "n": n,
                "loss": out["loss"] * n,
                "acc_counts": out["acc_counts"],
                "loss_dict": jax.tree_util.tree_map(lambda v: v * n, out["loss_dict"]),
            }
            acc = contrib if acc is None else jax.tree_util.tree_map(jnp.add, acc, contrib)
        acc = jax.device_get(acc) if acc is not None else {
            "n": 0.0, "loss": 0.0, "acc_counts": {k: 0.0 for k in self.top_k},
            "loss_dict": {},
        }
        n_total = float(acc["n"])
        loss_total = float(acc["loss"])
        counts = {k: float(acc["acc_counts"][k]) for k in self.top_k}
        loss_dict_tot = {k: float(v) for k, v in acc["loss_dict"].items()}
        if jax.process_count() > 1 and self.batch_sharding is None:
            # batch_sharding set -> batches are global arrays and the jitted
            # sums are already cross-process (no host reduction needed; an
            # allgather+sum would double-count). Only the unsharded local
            # path needs the host-side reduction — loss_dict totals included,
            # else Val/Loss_dict would be process-local (key order is
            # deterministic across processes: same eval program).
            from jax.experimental import multihost_utils

            dict_keys = sorted(loss_dict_tot)
            arr = np.asarray(
                [n_total, loss_total]
                + [counts[k] for k in self.top_k]
                + [loss_dict_tot[k] for k in dict_keys]
            )
            arr = multihost_utils.process_allgather(arr).sum(axis=0)
            n_total, loss_total = arr[0], arr[1]
            for i, k in enumerate(self.top_k):
                counts[k] = arr[2 + i]
            for i, k in enumerate(dict_keys):
                loss_dict_tot[k] = arr[2 + len(self.top_k) + i]
        n_total = max(n_total, 1.0)
        return {
            "loss": loss_total / n_total,
            "loss_dict": {k: v / n_total for k, v in loss_dict_tot.items()},
            "acc": {k: counts[k] / n_total for k in self.top_k},
        }


class IncEvaluation:
    """Incremental/continual multi-task evaluation (reference
    ``eval/inc_evaluation.py:17-127``; latent there — not exported by the
    package): each task covers a contiguous label range; per-task accuracy is
    computed with labels offset into task-local space, plus overall accuracy
    over the concatenated head."""

    def __init__(
        self,
        apply_fn,  # (params, buffers, image, task) -> output with 'pred'
        val_loaders,  # one loader per task
        classes_per_task,  # list of class counts, one per task
        batch_sharding=None,
    ):
        self.val_loaders = list(val_loaders)
        self.classes_per_task = list(classes_per_task)
        self.offsets = np.concatenate([[0], np.cumsum(self.classes_per_task)])
        self.batch_sharding = batch_sharding

        def step(params, buffers, batch, task: int):
            out = apply_fn(params, buffers, batch["image"], task)
            pred = out["pred"]["pred"] if isinstance(out["pred"], dict) else out["pred"]
            valid = batch.get("valid", jnp.ones(pred.shape[0], jnp.float32))
            local_label = batch["label"] - int(self.offsets[task])
            lo, hi = int(self.offsets[task]), int(self.offsets[task + 1])
            task_pred = pred[:, lo:hi]
            correct_task = (jnp.argmax(task_pred, 1) == local_label).astype(jnp.float32)
            correct_all = (jnp.argmax(pred, 1) == batch["label"]).astype(jnp.float32)
            return {
                "task_correct": jnp.sum(correct_task * valid),
                "all_correct": jnp.sum(correct_all * valid),
                "n": jnp.sum(valid),
            }

        self._step = jax.jit(step, static_argnums=(3,))

    def __call__(self, params, buffers=None):
        buffers = buffers if buffers is not None else {}
        per_task = {}
        total_correct = total_n = 0.0
        for task, loader in enumerate(self.val_loaders):
            acc = None
            for batch in loader:
                if self.batch_sharding is not None:
                    batch = {k: put_local_batch(v, self.batch_sharding) for k, v in batch.items()}
                out = self._step(params, buffers, batch, task)
                acc = out if acc is None else jax.tree_util.tree_map(jnp.add, acc, out)
            acc = jax.device_get(acc) if acc is not None else {
                "task_correct": 0.0, "all_correct": 0.0, "n": 0.0}
            if jax.process_count() > 1 and self.batch_sharding is None:
                # unsharded local path: host-side cross-process reduction
                # (sharded batches are global arrays; jit sums cover it)
                from jax.experimental import multihost_utils

                arr = np.asarray(
                    [acc["task_correct"], acc["all_correct"], acc["n"]], np.float64
                )
                arr = multihost_utils.process_allgather(arr).sum(axis=0)
                acc = dict(zip(("task_correct", "all_correct", "n"), arr))
            t_correct = float(acc["task_correct"])
            a_correct = float(acc["all_correct"])
            n = float(acc["n"])
            per_task[task] = {
                "acc_task": t_correct / max(n, 1.0),
                "acc_all": a_correct / max(n, 1.0),
            }
            total_correct += a_correct
            total_n += n
        return {"per_task": per_task, "acc": total_correct / max(total_n, 1.0)}


class CBEvaluation:
    """Agreement between quantised and original mid-feature classification."""

    def __init__(self, classify_fn: Callable, val_loader, batch_sharding=None):
        # classify_fn(params, buffers, image, quantize) -> logits [bs, K]
        self.val_loader = val_loader
        self.batch_sharding = batch_sharding

        def step(params, buffers, batch):
            pred_q = jnp.argmax(classify_fn(params, buffers, batch["image"], True), axis=1)
            pred_o = jnp.argmax(classify_fn(params, buffers, batch["image"], False), axis=1)
            valid = batch.get("valid", jnp.ones(pred_q.shape[0], jnp.float32))
            gt = batch["label"]
            return {
                "acc": jnp.sum((pred_q == gt) * valid),
                "acc_model": jnp.sum((pred_q == pred_o) * valid),
                "acc_origin": jnp.sum((pred_o == gt) * valid),
                "n": jnp.sum(valid),
            }

        self._step = jax.jit(step)

    def __call__(self, params, buffers=None) -> Dict[str, float]:
        buffers = buffers if buffers is not None else {}
        acc = None
        for batch in self.val_loader:
            if self.batch_sharding is not None:
                batch = {k: put_local_batch(v, self.batch_sharding) for k, v in batch.items()}
            out = self._step(params, buffers, batch)
            acc = out if acc is None else jax.tree_util.tree_map(jnp.add, acc, out)
        sums = (
            {k: float(v) for k, v in jax.device_get(acc).items()}
            if acc is not None
            else {"acc": 0.0, "acc_model": 0.0, "acc_origin": 0.0, "n": 0.0}
        )
        if jax.process_count() > 1 and self.batch_sharding is None:
            # sharded batches are global: jit sums already cross-process
            from jax.experimental import multihost_utils

            arr = np.asarray([sums[k] for k in ("acc", "acc_model", "acc_origin", "n")])
            arr = multihost_utils.process_allgather(arr).sum(axis=0)
            sums = dict(zip(("acc", "acc_model", "acc_origin", "n"), arr))
        n = max(sums["n"], 1.0)
        return {k: sums[k] / n for k in ("acc", "acc_model", "acc_origin")}
