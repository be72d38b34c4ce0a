"""Generic training loop (reference ``schema_inference/tasks/worker.py`` /
``worker_schema_net.py`` Trainer classes).

One jitted ``train_step`` carries: optional pre-step parameter projection (the
SchemaNet atlas ``normalize()``), dropout-rng threading, weighted loss dict,
grad clip, optimizer update. The loop reproduces the reference's structure:
initial validation, per-epoch reshuffle, ``val_interval``-gated validation +
checkpointing with best-tracking, per-epoch LR schedule stepping.

bf16 note: the reference offers fp16 AMP + GradScaler behind ``--use-amp``;
on TPU we run bf16 compute via model dtype with fp32 params/optimizer — no
loss scaling needed.
"""

from __future__ import annotations

import dataclasses
import functools
import logging
import time
from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from ..parallel.mesh import batch_sharding, make_mesh, put_local_batch, shard_params
from ..schema.loss import weighted_total
from ..utils.logging_utils import TBWriter
from ..utils.metrics import tensor_dict_items
from .common import (
    CheckpointManager,
    TrainState,
    epoch_schedule,
    load_metadata,
    make_optimizer,
    make_train_prng,
    merge_trees,
    save_metadata,
    split_by_labels,
)


@dataclasses.dataclass
class TrainerConfig:
    train_epochs: int
    print_interval: int = 20
    val_interval: int = 500
    batch_size: int = 64
    clip_max_norm: Optional[float] = None
    # jax.checkpoint the loss: trade recompute for memory. True/"full"
    # recomputes everything; "dots" keeps matmul outputs and recomputes only
    # elementwise ops — at ImageNet scale (bs=128) measured 254.6 -> 224.4
    # ms/step over full remat while still fitting the 16 GB chip.
    remat: Any = False
    optimizer: Dict[str, Any] = dataclasses.field(default_factory=dict)
    lr_schedule: Dict[str, Any] = dataclasses.field(default_factory=dict)
    param_groups: Optional[Sequence[Dict[str, Any]]] = None
    drop_remain: bool = False
    frozen_patterns: Sequence[str] = ()
    # retain only the newest N iter-* checkpoints (best is never pruned);
    # None/0 keeps all — the reference kept every iter-N.pth forever
    max_keep: Optional[int] = 3
    # when the atlas projection runs relative to the optimizer update:
    # 'pre'  — at the step's start, like the reference's normalize() before
    #          every train_iter (worker_schema_net.py:127);
    # 'post' — immediately after the update in the SAME jit program. The
    #          alternating sequence project->update->project->update is
    #          identical (the projection is idempotent and params start
    #          projected — pinned by tests/test_project_timing.py), but XLA
    #          fuses the projection into the update's epilogue instead of
    #          paying a separate cross-step read+write sweep of the
    #          [K, V, V] atlas, and per-eval-batch re-projection drops out.
    project_timing: str = "pre"

    @classmethod
    def from_cfg(cls, train_cfg: Dict[str, Any], **over):
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in train_cfg.items() if k in known}
        kwargs.update(over)
        return cls(**kwargs)


class Trainer:
    """apply_fn(params, buffers, image, rng, train) -> output dict with 'pred'
    (plus atlas tensors for the schema loss)."""

    def __init__(
        self,
        cfg: TrainerConfig,
        apply_fn: Callable,
        loss_fn: Callable,
        loss_weights: Dict[str, float],
        params: Any,
        buffers: Any,
        train_loader,
        val_loader,
        mesh=None,
        project_params: Optional[Callable] = None,
        log_dir: Optional[str] = None,
        ckpt_dir: Optional[str] = None,
        resume: str = "",
        seed: int = 42,
        top_k: Sequence[int] = (1, 5),
        extra_scalars: Optional[Callable[[Any], Dict[str, float]]] = None,
        buffer_guard: Optional[Callable[[Any], None]] = None,
        name: str = "trainer",
        compute_dtype: Any = None,
        fused_atlas: Optional[Dict[str, Any]] = None,
    ):
        self.cfg = cfg
        self.apply_fn = apply_fn
        self.loss_fn = loss_fn
        self.loss_weights = dict(loss_weights)
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.project_params = project_params
        # fused AdamW+projection for the atlas tensors (ops/pallas/atlas_opt):
        # spec built by the worker — {'subtree', 'hot': {name: remove_self_loop},
        # 'lr_scale', 'weight_decay', 'clamp', 'interpret'}. The hot tensors'
        # projection folds into the update (gradient sees identical projected
        # params — see atlas_opt.py docstring); project_params degrades to the
        # cheap attr-weight clamp and the full projection runs once at init.
        self._fused_atlas = fused_atlas
        if fused_atlas is not None:
            if project_params is None:
                raise ValueError("fused_atlas requires project_params")
            self.project_params = fused_atlas["clamp"]
            from ..ops.pallas.atlas_opt import adamw_project_rows

            self._adamw_project_rows = functools.partial(
                adamw_project_rows, interpret=bool(fused_atlas.get("interpret"))
            )
        self.logger = logging.getLogger(name)
        self.tb = TBWriter(log_dir)
        self.top_k = tuple(top_k)
        self.extra_scalars = extra_scalars

        self.mesh = mesh if mesh is not None else make_mesh()
        self.batch_sharding = batch_sharding(self.mesh)
        # device-side normalisation constants for uint8 batches (loaders with
        # device_normalize=True ship raw uint8: 4x less host->device traffic)
        self._norm_mean = jnp.asarray(
            getattr(train_loader, "mean", (0.0, 0.0, 0.0)), jnp.float32
        )
        self._norm_std = jnp.asarray(
            getattr(train_loader, "std", (1.0, 1.0, 1.0)), jnp.float32
        )
        # the model's compute dtype: _prep_image emits it directly so the
        # normalised image is written (and re-read by the patch embed) at the
        # narrow width — on bf16 runs this halves the step's image traffic;
        # numerically identical because the patch-embed Dense promotes its
        # input to the module dtype anyway
        self._compute_dtype = compute_dtype

        steps_per_epoch = max(len(train_loader), 1)
        self.steps_per_epoch = steps_per_epoch
        sched_cfg = dict(cfg.lr_schedule)
        self.schedule = epoch_schedule(
            name=sched_cfg.pop("name", "cosine_annealing"),
            base_lr=float(cfg.optimizer.get("lr", 1e-3)),
            steps_per_epoch=steps_per_epoch,
            total_epochs=cfg.train_epochs,
            warmup_iters=int(sched_cfg.pop("warmup_iters", 0) or 0),
            eta_min=float(sched_cfg.pop("eta_min", 0.0) or 0.0),
            T_max=sched_cfg.pop("T_max", None),
        )
        _, self.param_labels = make_optimizer(
            params,
            cfg.optimizer,
            self.schedule,
            param_groups=cfg.param_groups,
            drop_remain=cfg.drop_remain,
            clip_max_norm=cfg.clip_max_norm,
            frozen_patterns=cfg.frozen_patterns,
        )
        # frozen subtrees leave the train state: they are closure constants of
        # the jitted steps (no per-call dispatch, no optimizer state)
        train_params, frozen_params = split_by_labels(params, self.param_labels)
        self.frozen_params = shard_params(self.mesh, frozen_params)
        assert cfg.project_timing in ("pre", "post"), cfg.project_timing
        if (
            cfg.project_timing == "post"
            and self.project_params is not None
            and self._fused_atlas is None
        ):
            # establish the projected invariant once; the post-update
            # projection inside each step maintains it from here on
            train_params = self.project_params(train_params)
        if self._fused_atlas is not None:
            # project once up front: from here on the hot tensors are kept
            # projected by the fused update itself (the per-step hook is only
            # the attr clamp). Clipping moves out of the optax chain so the
            # global norm still spans ALL grads, hot included.
            train_params = project_params(train_params)
            hot0, rest0 = self._split_hot(train_params)
            self.tx, _ = make_optimizer(
                rest0,
                cfg.optimizer,
                self.schedule,
                param_groups=cfg.param_groups,
                drop_remain=False,
                clip_max_norm=None,
            )
            train_params = shard_params(self.mesh, train_params)
            buffers = shard_params(self.mesh, buffers)
            hot0, rest0 = self._split_hot(train_params)
            opt_state = {
                "inner": jax.jit(self.tx.init)(rest0),
                "m": jax.tree_util.tree_map(jnp.zeros_like, hot0),
                "v": jax.tree_util.tree_map(jnp.zeros_like, hot0),
            }
        else:
            self.tx, _ = make_optimizer(
                train_params,
                cfg.optimizer,
                self.schedule,
                param_groups=cfg.param_groups,
                drop_remain=False,
                clip_max_norm=cfg.clip_max_norm,
            )

            train_params = shard_params(self.mesh, train_params)
            buffers = shard_params(self.mesh, buffers)
            opt_state = jax.jit(self.tx.init)(train_params)
        self.state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=train_params,
            buffers=buffers,
            opt_state=opt_state,
            rng=make_train_prng(seed),
        )

        self.epoch = 0
        self.start_epoch = 0
        self.best_acc = 0.0
        self.best_iter = 0
        self.ckpt = (
            CheckpointManager(ckpt_dir, max_keep=cfg.max_keep or None)
            if ckpt_dir
            else None
        )
        # validates restored buffers against trace-time constants the apply_fn
        # was built with (e.g. StaticIds of class_ingredients) — a checkpoint
        # whose buffers differ would silently train with wrong gradients
        self.buffer_guard = buffer_guard
        if resume:
            self.resume(resume)

        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._eval_step = jax.jit(self._eval_step_impl)

    # -- jitted bodies -------------------------------------------------------

    def _split_hot(self, tree):
        """Split the fused-atlas hot leaves out of a train-param-shaped tree."""
        spec = self._fused_atlas
        sub = dict(tree[spec["subtree"]])
        hot = {k: sub.pop(k) for k in spec["hot"]}
        rest = dict(tree)
        rest[spec["subtree"]] = sub
        return hot, rest

    def _fused_update(self, grads, state, params):
        """AdamW + projection with the hot atlas tensors updated by the fused
        Pallas kernel (one HBM pass instead of update + separate projection).

        Clipping replicates optax.clip_by_global_norm over the FULL grad tree
        (the chain inside self.tx carries no clip stage in this mode), so the
        norm matches the unfused optimizer's exactly."""
        spec = self._fused_atlas
        if self.cfg.clip_max_norm:
            clipper = optax.clip_by_global_norm(self.cfg.clip_max_norm)
            grads, _ = clipper.update(grads, clipper.init(grads))
        g_hot, g_rest = self._split_hot(grads)
        p_hot, p_rest = self._split_hot(params)
        opt = state.opt_state
        updates, inner = self.tx.update(g_rest, opt["inner"], p_rest)
        p_rest = optax.apply_updates(p_rest, updates)
        # the inner adamw ticks its own count; the fused side's Adam bias
        # correction and schedule both key off state.step (== updates applied)
        lr_t = self.schedule(state.step) * spec["lr_scale"]
        new_hot, new_m, new_v = {}, {}, {}
        for k, remove_self_loop in spec["hot"].items():
            new_hot[k], new_m[k], new_v[k] = self._adamw_project_rows(
                p_hot[k], g_hot[k], opt["m"][k], opt["v"][k], state.step,
                lr=lr_t,
                weight_decay=spec["weight_decay"],
                remove_self_loop=remove_self_loop,
            )
        sub = dict(p_rest[spec["subtree"]], **new_hot)
        params = dict(p_rest)
        params[spec["subtree"]] = sub
        return params, {"inner": inner, "m": new_m, "v": new_v}

    def _prep_image(self, image):
        """uint8 batches are normalised on device (XLA fuses this into the
        first conv); the result is emitted in the model's compute dtype."""
        if image.dtype == jnp.uint8:
            image = (image.astype(jnp.float32) / 255.0 - self._norm_mean) / self._norm_std
        if self._compute_dtype is not None and image.dtype != self._compute_dtype:
            image = image.astype(self._compute_dtype)
        return image

    def _train_step_impl(self, state: TrainState, batch):
        params = state.params
        if self.project_params is not None and self.cfg.project_timing == "pre":
            params = self.project_params(params)
        rng, step_rng = jax.random.split(state.rng)

        image = self._prep_image(batch["image"])

        def compute_loss(p):
            full = merge_trees(self.frozen_params, p)
            out = self.apply_fn(full, state.buffers, image, step_rng, True)
            # models with running statistics (BatchNorm) return their updated
            # buffer collection under '__buffers__'
            new_buffers = out.pop("__buffers__", None) if isinstance(out, dict) else None
            loss_dict = self.loss_fn(out, {"label": batch["label"]})
            return weighted_total(loss_dict, self.loss_weights), (loss_dict, new_buffers)

        if self.cfg.remat:
            policy = (
                jax.checkpoint_policies.dots_saveable
                if self.cfg.remat == "dots"
                else None
            )
            compute_loss = jax.checkpoint(compute_loss, policy=policy)
        (total, (loss_dict, new_buffers)), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(params)
        if self._fused_atlas is not None:
            params, opt_state = self._fused_update(grads, state, params)
        else:
            updates, opt_state = self.tx.update(grads, state.opt_state, params)
            params = optax.apply_updates(params, updates)
            if self.project_params is not None and self.cfg.project_timing == "post":
                params = self.project_params(params)
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            buffers=new_buffers if new_buffers is not None else state.buffers,
            opt_state=opt_state,
            rng=rng,
        )
        metrics = {"loss": total, **loss_dict}
        return new_state, metrics

    def _eval_step_impl(self, state: TrainState, batch):
        params = state.params
        if self.project_params is not None and self.cfg.project_timing == "pre":
            # 'post' keeps state.params projected invariantly — re-projecting
            # per eval batch would be an idempotent no-op sweep
            params = self.project_params(params)
        params = merge_trees(self.frozen_params, params)
        out = self.apply_fn(
            params, state.buffers, self._prep_image(batch["image"]), state.rng, False
        )
        loss_dict = self.loss_fn(out, {"label": batch["label"]})
        total = weighted_total(loss_dict, self.loss_weights)
        pred = out["pred"]["pred"] if isinstance(out["pred"], dict) else out["pred"]
        valid = batch.get("valid")
        if valid is None:
            valid = jnp.ones(pred.shape[0], jnp.float32)
        max_k = min(max(self.top_k), pred.shape[-1])
        _, top_pred = jax.lax.top_k(pred, max_k)
        correct = (top_pred == batch["label"][:, None]).astype(jnp.float32)
        acc_counts = {
            k: jnp.sum(jnp.max(correct[:, : min(k, max_k)], axis=1) * valid)
            for k in self.top_k
        }
        return {
            "loss": total,
            "loss_dict": loss_dict,
            "acc_counts": acc_counts,
            "n": jnp.sum(valid),
        }

    # -- host loop -----------------------------------------------------------

    def train_iter(self, batch) -> Dict[str, float]:
        batch = {k: put_local_batch(v, self.batch_sharding) for k, v in batch.items()}
        self.state, metrics = self._train_step(self.state, batch)
        return metrics

    def validate(self) -> Dict[str, Any]:
        # accumulate on device, fetch ONCE per validation: a float() per batch
        # forces a host round-trip per eval step, which dominates eval
        # wall-clock on slow-uplink hosts
        acc = None
        self.val_loader.set_epoch(0)
        for batch in self.val_loader:
            batch = {k: put_local_batch(v, self.batch_sharding) for k, v in batch.items()}
            out = self._eval_step(self.state, batch)
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
        totals = {k: float(v) for k, v in acc["loss_dict"].items()}
        # NO host-side allgather here: batches are GLOBAL arrays (every host
        # contributes its loader shard via put_local_batch), so the jitted
        # jnp.sum reductions are already cross-process — XLA inserts the
        # collective from the shardings. An extra process_allgather+sum would
        # double-count every total by process_count. Validated by the
        # 2-process integration test (tests/test_multihost.py) asserting
        # multi-process val loss/acc == single-process.
        n_total = max(n_total, 1.0)
        return {
            "loss": loss_total / n_total,
            "loss_dict": {k: v / n_total for k, v in totals.items()},
            "acc": {k: counts[k] / n_total for k in self.top_k},
        }

    @property
    def iter_count(self) -> int:
        return int(self.state.step)

    @property
    def full_params(self):
        """Trainable params merged back with the frozen closure constants."""
        return merge_trees(self.frozen_params, self.state.params)

    def validate_and_save(self, show_tb: bool = True):
        if self.project_params is not None:
            # the reference's normalize() persistently mutates the atlas before
            # eval + checkpointing (worker_schema_net.py:181) — mirror that so
            # saved checkpoints hold projected (clamped/normalised) weights
            self.state = self.state.replace(params=self.project_params(self.state.params))
        eval_dict = self.validate()
        acc = eval_dict["acc"][1]
        if jax.process_index() == 0:
            self.logger.info(
                "Validation loss: %.5f, acc: %.4f, loss dict: %s",
                eval_dict["loss"], acc, tensor_dict_items(eval_dict["loss_dict"]),
            )
            if show_tb:
                self.tb.add_scalar("Val/Loss", eval_dict["loss"], self.iter_count)
                self.tb.add_scalar("Val/Acc", acc, self.iter_count)
                self.tb.add_scalar("Val/Acc@1", acc, self.iter_count)
                if 5 in eval_dict["acc"]:
                    self.tb.add_scalar("Val/Acc@5", eval_dict["acc"][5], self.iter_count)
                self.tb.add_scalars("Val/Loss_dict", eval_dict["loss_dict"], self.iter_count)
        is_best = acc > self.best_acc
        if is_best:
            self.best_acc = float(acc)
            self.best_iter = self.iter_count
        if self.ckpt is not None:
            tag = f"iter-{self.iter_count}"
            self.ckpt.save(
                tag,
                {
                    "params": self.full_params,  # frozen + trainable, complete
                    "buffers": self.state.buffers,
                    "opt_state": self.state.opt_state,
                    "step": self.state.step,
                },
                is_best=is_best,
            )
            save_metadata(
                self.ckpt.ckpt_dir,
                {
                    "epoch": self.epoch,
                    "iter": self.iter_count,
                    "best_acc": self.best_acc,
                    "best_iter": self.best_iter,
                    "eval": {str(k): v for k, v in eval_dict["acc"].items()},
                    "last_tag": tag,
                },
            )
        return eval_dict

    def resume(self, tag_or_path: str):
        assert self.ckpt is not None, "resume requires a ckpt_dir"
        if tag_or_path == "auto":
            # pick up where the last run left off (meta.json last_tag)
            meta = load_metadata(self.ckpt.ckpt_dir) or {}
            tag_or_path = meta.get("last_tag", "")
            if not tag_or_path or not self.ckpt.exists(tag_or_path):
                self.logger.info("resume=auto: no previous checkpoint found; fresh start")
                return
        template = {
            "params": self.full_params,
            "buffers": self.state.buffers,
            "opt_state": self.state.opt_state,
            "step": self.state.step,
        }
        restored = self.ckpt.restore(tag_or_path, template)
        if self.buffer_guard is not None:
            self.buffer_guard(restored["buffers"])
        train_params, frozen_params = split_by_labels(
            restored["params"], self.param_labels
        )
        if (
            self.cfg.project_timing == "post"
            and self.project_params is not None
            and self._fused_atlas is None
        ):
            # checkpoints written by validate_and_save hold projected weights
            # already; re-establish the invariant for foreign checkpoints
            train_params = self.project_params(train_params)
        self.frozen_params = shard_params(self.mesh, frozen_params)
        self.state = self.state.replace(
            params=shard_params(self.mesh, train_params),
            buffers=restored["buffers"],
            opt_state=restored["opt_state"],
            step=jnp.asarray(restored["step"], jnp.int32),
        )
        meta = load_metadata(self.ckpt.ckpt_dir) or {}
        self.start_epoch = int(meta.get("epoch", 0)) + 1
        self.best_acc = float(meta.get("best_acc", 0.0))
        self.best_iter = int(meta.get("best_iter", 0))
        self.logger.info(
            "Resumed from %s at epoch %d, iter %d", tag_or_path, self.start_epoch, self.iter_count
        )

    def install_signal_handlers(self):
        """Graceful shutdown: SIGTERM/SIGINT request a checkpoint + clean stop
        at the next step boundary (the reference kills children and loses
        un-checkpointed progress, dist_engine.py:87-103). Previous handlers
        are restored by :meth:`restore_signal_handlers`."""
        import signal

        def handler(signum, frame):
            self.logger.warning("signal %s received; will checkpoint and stop", signum)
            self._stop_requested = True

        self._prev_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                self._prev_handlers[sig] = signal.signal(sig, handler)
            except ValueError:  # not in main thread
                return

    def restore_signal_handlers(self):
        import signal

        for sig, prev in getattr(self, "_prev_handlers", {}).items():
            try:
                signal.signal(sig, prev)
            except ValueError:
                return

    def __call__(self, initial_validation: bool = True):
        start = time.time()
        self._stop_requested = False
        self.install_signal_handlers()
        if initial_validation:
            self.logger.info("Initial testing")
            self.validate_and_save(show_tb=False)
        from ..data.loader import device_prefetch
        from ..utils.profiling import StepTimer

        timer = StepTimer(window=max(self.cfg.print_interval, 2))
        for self.epoch in range(self.start_epoch, self.cfg.train_epochs):
            self.train_loader.set_epoch(self.epoch)
            prefetched = device_prefetch(iter(self.train_loader), self.batch_sharding)
            for step, batch in enumerate(prefetched):
                metrics = self.train_iter(batch)
                tput = timer.step(self.cfg.batch_size)
                it = self.iter_count
                if tput is not None and jax.process_index() == 0:
                    self.logger.info(
                        "throughput: %.1f img/s (%.1f steps/s)",
                        tput["items_per_sec"], tput["steps_per_sec"],
                    )
                    self.tb.add_scalar("Train/ImagesPerSec", tput["items_per_sec"], it)
                if it % self.cfg.print_interval == 0 and jax.process_index() == 0:
                    loss_items = tensor_dict_items(
                        {k: v for k, v in metrics.items() if k != "loss"}
                    )
                    lr = float(self.schedule(self.state.step))
                    self.logger.info(
                        "Epoch %3d|%3d, step %4d|%4d, iter %6d, lr %.3e, loss %.5f, %s",
                        self.epoch, self.cfg.train_epochs, step, self.steps_per_epoch,
                        it, lr, float(metrics["loss"]), loss_items,
                    )
                    self.tb.add_scalar("Train/Loss", float(metrics["loss"]), it)
                    self.tb.add_scalars("Train/Loss_dict", loss_items, it)
                    self.tb.add_scalar("Train/Lr", lr, it)
                    if self.extra_scalars is not None:
                        self.tb.add_scalars("Weights", self.extra_scalars(self.state), it)
                if it > 0 and it % self.cfg.val_interval == 0:
                    self.validate_and_save()
                if getattr(self, "_stop_requested", False):
                    self.logger.warning("stopping early on signal; saving checkpoint")
                    self.validate_and_save()
                    self.restore_signal_handlers()
                    return None
        self.logger.info("Final validation")
        final = self.validate_and_save()
        self.restore_signal_handlers()
        if jax.process_index() == 0:
            self.logger.info(
                "Training time %.1fs; best acc %.4f @ iter %d",
                time.time() - start, self.best_acc, self.best_iter,
            )
        return final
