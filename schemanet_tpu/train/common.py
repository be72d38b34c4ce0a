"""Training substrate: train state, optimizer factory, LR schedules, ckpts.

Re-creates the cv_lib surface the reference trainers consume:
* ``get_optimizer`` (AdamW) + regex param groups with per-group hyperparams and
  ``drop_remain`` freezing (reference ``utils/customs_param_group.py:11-63``)
  via ``optax.multi_transform``;
* ``cosine_annealing`` scheduler with ``T_max``/``warmup_iters``/``eta_min``
  stepped once per *epoch* (reference ``worker.py:256`` steps per epoch);
* checkpoint save/resume with best-tracking (reference ``worker.py:92-117,
  221-242``) through Orbax.
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    buffers: Any
    opt_state: Any
    rng: jax.Array


def make_train_prng(seed: int) -> jax.Array:
    """Root PRNG key for a training run.

    The policy's ``prng_impl`` field (`kernels.prng_impl: rbg` / env
    SCHEMANET_PRNG_IMPL=rbg, see ops/policy.py) switches the whole
    dropout/drop-path stream to XLA's RngBitGenerator (hardware RNG on TPU)
    instead of the default threefry, whose counter math lowers to long vector
    chains — at stage-0 scale the per-step mask generation is [bs, n, d] x
    ~25 sites. The stream (and therefore the realised masks) differs from
    threefry by design; the reference's torch RNG differs from both. NOTE:
    rbg keys are [4]x uint32 (threefry: [2]), so checkpoints taken under one
    impl do not resume under the other.
    """
    from ..ops.policy import resolve

    impl = resolve("prng_impl")
    if impl and impl != "threefry":
        # legacy raw keys carry no impl tag — split/fold_in/bernoulli resolve
        # them through jax_default_prng_impl, so flip that (process-wide; this
        # is an opt-in perf knob) instead of minting a typed key that Orbax
        # would have to checkpoint as an extended dtype.
        jax.config.update("jax_default_prng_impl", impl)
    return jax.random.PRNGKey(seed)


# ---------------------------------------------------------------------------
# LR schedules
# ---------------------------------------------------------------------------


def epoch_schedule(
    name: str,
    base_lr: float,
    steps_per_epoch: int,
    total_epochs: int,
    warmup_iters: int = 0,
    eta_min: float = 0.0,
    T_max: Optional[int] = None,
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """LR as a function of global step, constant within each epoch.

    Matches the reference semantics: cv_lib's cosine_annealing is stepped once
    per epoch (worker.py:256) with warmup_iters counted in epochs.
    """
    t_max = T_max if T_max is not None else total_epochs

    def lr_at_epoch(e):
        if name in ("cosine_annealing", "cosine"):
            if warmup_iters and e < warmup_iters:
                return base_lr * (e + 1) / warmup_iters
            progress = min(max(e - warmup_iters, 0) / max(t_max - warmup_iters, 1), 1.0)
            return eta_min + (base_lr - eta_min) * 0.5 * (1 + np.cos(np.pi * progress))
        if name == "constant":
            return base_lr
        raise KeyError(f"unknown schedule {name!r}")

    table = jnp.asarray(
        [lr_at_epoch(e) for e in range(total_epochs + 1)], dtype=jnp.float32
    )

    def schedule(step):
        epoch = jnp.minimum(step // max(steps_per_epoch, 1), total_epochs)
        return table[epoch]

    return schedule


# ---------------------------------------------------------------------------
# Optimizer with regex param groups
# ---------------------------------------------------------------------------


def _param_labels(params: Any, groups: Sequence[Dict[str, Any]], drop_remain: bool):
    """Assign each param path to the first matching regex group (by torch-style
    dotted name), 'default' if none, 'frozen' when drop_remain."""

    def label_for(path, _):
        name = ".".join(str(getattr(k, "key", k)) for k in path)
        for gi, group in enumerate(groups):
            if re.match(group["pattern"], name):
                return f"group_{gi}"
        return "frozen" if drop_remain else "default"

    return jax.tree_util.tree_map_with_path(label_for, params)


def _scheduled_decay(wd: float, sched: Callable) -> optax.GradientTransformation:
    """Decoupled weight decay matching optax.adamw's: update -= lr_t * wd * p.

    Chained AFTER a transform whose output already includes the learning rate
    (adafactor), so the decay term must be schedule-scaled here rather than by
    a downstream scale_by_learning_rate."""

    def init_fn(params):
        del params
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("scheduled decay requires params")
        lr = sched(state.count)
        updates = jax.tree_util.tree_map(
            lambda u, p: u - lr * wd * p.astype(u.dtype), updates, params
        )
        return updates, optax.ScaleByScheduleState(count=state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)


def scale_by_adam_lowmem(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    *,
    mu_dtype=None,
    nu_dtype=None,
    factored_min_size: Optional[int] = None,
) -> optax.GradientTransformation:
    """Adam scaling with reduced-memory moment storage.

    The ImageNet-scale atlas edge tensor ([K=1000, V=500, V=500] fp32) makes
    plain AdamW sweep ~7 GB of optimizer state + gradient HBM per step
    (profiled at ~5% of the r04 step, PERFORMANCE.md). Two orthogonal levers,
    both exact-Adam when disabled:

    * ``mu_dtype`` / ``nu_dtype``: store the first/second moment in a narrow
      dtype (bf16 halves state and traffic; the EMA update itself still runs
      in fp32 so only the *storage* rounds).
    * ``factored_min_size``: for leaves with ndim>=2 whose two trailing dims
      are both >= the threshold, replace the full second moment with
      Adafactor-style row/col statistics (Shazeer & Stern 2018): per leading
      index, ``r = ema(sum_j g^2)``, ``c = ema(sum_i g^2)`` and
      ``nu_hat_ij = r_i c_j / sum(r)`` — the state drops from O(n*m) to
      O(n+m). First moment, bias correction and the eps placement stay
      Adam's, so this is "Adam with a factored nu", not full Adafactor (no
      update clipping / relative step sizes), keeping the A/B vs AdamW clean.

    State nests each nu leaf as ``{"full": ...}`` or ``{"row","col"}`` so a
    checkpoint records which layout it was trained with.
    """
    mu_dtype = jnp.dtype(mu_dtype) if mu_dtype else None
    nu_dtype = jnp.dtype(nu_dtype) if nu_dtype else None

    def _factor(p) -> bool:
        return (
            factored_min_size is not None
            and p.ndim >= 2
            and min(p.shape[-2:]) >= factored_min_size
        )

    def init_fn(params):
        mu = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=mu_dtype or p.dtype), params
        )

        def nu_init(p):
            if _factor(p):
                return {
                    "row": jnp.zeros(p.shape[:-1], jnp.float32),
                    "col": jnp.zeros(p.shape[:-2] + p.shape[-1:], jnp.float32),
                }
            return {"full": jnp.zeros_like(p, dtype=nu_dtype or p.dtype)}

        nu = jax.tree.map(nu_init, params)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32), mu=mu, nu=nu
        )

    def update_fn(updates, state, params=None):
        del params
        count = optax.safe_int32_increment(state.count)
        bc1 = 1.0 - b1**count.astype(jnp.float32)
        bc2 = 1.0 - b2**count.astype(jnp.float32)

        g_flat, tdef = jax.tree.flatten(updates)
        mu_flat = tdef.flatten_up_to(state.mu)
        nu_flat = tdef.flatten_up_to(state.nu)
        new_mu, new_nu, out = [], [], []
        for g, m, nu in zip(g_flat, mu_flat, nu_flat):
            g32 = g.astype(jnp.float32)
            m32 = b1 * m.astype(jnp.float32) + (1.0 - b1) * g32
            new_mu.append(m32.astype(mu_dtype) if mu_dtype else m32.astype(m.dtype))
            g2 = jnp.square(g32)
            if "full" in nu:
                n32 = b2 * nu["full"].astype(jnp.float32) + (1.0 - b2) * g2
                new_nu.append(
                    {"full": n32.astype(nu_dtype) if nu_dtype else n32.astype(nu["full"].dtype)}
                )
                nu_hat = n32 / bc2
            else:
                r = b2 * nu["row"] + (1.0 - b2) * g2.sum(-1)
                c = b2 * nu["col"] + (1.0 - b2) * g2.sum(-2)
                new_nu.append({"row": r, "col": c})
                # nu_hat = r c^T / sum(r): exact when g^2 is rank-1 per
                # leading index; bias corrections cancel to a single 1/bc2
                denom = jnp.maximum(r.sum(-1)[..., None, None], 1e-30)
                nu_hat = (r[..., :, None] * c[..., None, :]) / denom / bc2
            u = (m32 / bc1) / (jnp.sqrt(nu_hat) + eps)
            out.append(u.astype(g.dtype))
        return (
            jax.tree.unflatten(tdef, out),
            optax.ScaleByAdamState(
                count=count,
                mu=jax.tree.unflatten(tdef, new_mu),
                nu=jax.tree.unflatten(tdef, new_nu),
            ),
        )

    return optax.GradientTransformation(init_fn, update_fn)


def adamw_lowmem(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    *,
    mu_dtype=None,
    nu_dtype=None,
    factored_min_size: Optional[int] = None,
) -> optax.GradientTransformation:
    """optax.adamw with ``scale_by_adam_lowmem`` as the inner scaling — with
    all lowmem knobs off the update sequence is identical to optax.adamw."""
    parts = [
        scale_by_adam_lowmem(
            b1, b2, eps,
            mu_dtype=mu_dtype, nu_dtype=nu_dtype,
            factored_min_size=factored_min_size,
        )
    ]
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(
        optax.scale_by_learning_rate(learning_rate)
    )
    return optax.chain(*parts)


def make_optimizer(
    params: Any,
    optimizer_cfg: Dict[str, Any],
    schedule: Callable,
    param_groups: Optional[Sequence[Dict[str, Any]]] = None,
    drop_remain: bool = False,
    clip_max_norm: Optional[float] = None,
    frozen_patterns: Sequence[str] = (),
) -> Tuple[optax.GradientTransformation, Any]:
    """AdamW with optional per-group overrides, global-norm clipping and frozen
    subtrees (returns (tx, labels) — labels exposed for tests/inspection)."""
    name = optimizer_cfg.get("name", "AdamW").lower()
    base_lr = float(optimizer_cfg.get("lr", 1e-3))
    weight_decay = float(optimizer_cfg.get("weight_decay", 0.0))
    # optional low-memory moments for ImageNet-scale atlases ([1000,500,500]
    # edges => 2 GB of fp32 Adam state and ~3 GB of optimizer HBM traffic per
    # step, profiled at ~8% of the train step). Off by default — reference
    # parity is fp32 AdamW. ``moment_dtype: bfloat16`` halves first-moment
    # state/traffic (optax mu_dtype); ``factored: true`` switches to adafactor
    # (rank-1 second moment), the standard large-model memory saver.
    moment_dtype = optimizer_cfg.get("moment_dtype")
    factored = bool(optimizer_cfg.get("factored", False))

    def make_one(
        lr_scale: float, wd: float, group_cfg: Optional[Dict[str, Any]] = None
    ) -> optax.GradientTransformation:
        def scaled(step):
            return schedule(step) * lr_scale

        # per-group low-memory moment overrides (VERDICT r4 #3): a param
        # group regex can target just the atlas edge tensors with
        # ``nu_dtype: bfloat16`` / ``nu_factored_min_size: 256`` (or a
        # group-local ``moment_dtype``) without touching the rest of the
        # model's exact-AdamW state. Any of these keys present routes the
        # group through adamw_lowmem (== adamw when all are null).
        gcfg = group_cfg or {}
        if name == "adamw" and any(
            k in gcfg for k in ("nu_dtype", "nu_factored_min_size", "moment_dtype")
        ):
            return adamw_lowmem(
                scaled,
                weight_decay=wd,
                mu_dtype=gcfg.get("moment_dtype", moment_dtype),
                nu_dtype=gcfg.get("nu_dtype"),
                factored_min_size=gcfg.get("nu_factored_min_size"),
            )
        if name == "adamw":
            if factored:
                # keep AdamW's decoupled, schedule-scaled weight decay
                # (update -= lr_t * wd * p) instead of adafactor's
                # weight_decay_rate, which is a fixed per-step multiplicative
                # decay NOT scaled by the lr schedule — so toggling
                # ``factored`` does not reinterpret ``weight_decay``
                tx = optax.adafactor(scaled, multiply_by_parameter_scale=False)
                if wd:
                    tx = optax.chain(tx, _scheduled_decay(wd, scaled))
                return tx
            return optax.adamw(scaled, weight_decay=wd, mu_dtype=moment_dtype)
        if name == "adam":
            return optax.adam(scaled, mu_dtype=moment_dtype)
        if name == "sgd":
            return optax.sgd(
                scaled, momentum=optimizer_cfg.get("momentum", 0.9), nesterov=False
            )
        raise KeyError(f"unknown optimizer {name!r}")

    groups = list(param_groups or [])
    transforms: Dict[str, optax.GradientTransformation] = {
        "default": make_one(1.0, weight_decay),
        "frozen": optax.set_to_zero(),
    }
    for gi, group in enumerate(groups):
        cfg = group.get("cfg", {}) or {}
        lr_scale = float(cfg.get("lr", base_lr)) / base_lr
        transforms[f"group_{gi}"] = make_one(
            lr_scale, float(cfg.get("weight_decay", weight_decay)), cfg
        )

    labels = _param_labels(params, groups, drop_remain)
    if frozen_patterns:
        def freeze(path, label):
            name_ = ".".join(str(getattr(k, "key", k)) for k in path)
            if any(re.match(p, name_) for p in frozen_patterns):
                return "frozen"
            return label

        labels = jax.tree_util.tree_map_with_path(
            lambda p, lab, _: freeze(p, lab), labels, params
        )

    tx = optax.multi_transform(transforms, labels)
    if clip_max_norm:
        tx = optax.chain(optax.clip_by_global_norm(clip_max_norm), tx)
    return tx, labels


# ---------------------------------------------------------------------------
# Checkpointing (Orbax)
# ---------------------------------------------------------------------------


def split_by_labels(params: Any, labels: Any, frozen_label: str = "frozen"):
    """Split a nested param dict into (trainable, frozen) trees by leaf labels.

    Keeping frozen subtrees OUT of the jitted step's call signature matters
    beyond cleanliness: each pytree leaf in a jit call costs per-call dispatch
    marshaling (severe on remote-tunnel backends), and frozen params can be
    baked into the executable as constants instead.
    """

    def go(p, l):
        train, frozen = {}, {}
        for key, value in p.items():
            if isinstance(value, dict):
                t, f = go(value, l[key])
                if t:
                    train[key] = t
                if f:
                    frozen[key] = f
            elif l[key] == frozen_label:
                frozen[key] = value
            else:
                train[key] = value
        return train, frozen

    return go(params, labels)


def merge_trees(base: Any, overlay: Any) -> Any:
    """Deep-merge two nested dicts (overlay wins on leaves)."""
    out = dict(base)
    for key, value in overlay.items():
        if key in out and isinstance(out[key], dict) and isinstance(value, dict):
            out[key] = merge_trees(out[key], value)
        else:
            out[key] = value
    return out


class CheckpointManager:
    """iter-N checkpoints + best copy, like the reference's ckpt dir layout
    (``ckpt/iter-<N>.pth`` / ``best.pth``, worker.py:235-242)."""

    def __init__(self, ckpt_dir: str, max_keep: Optional[int] = 3):
        """``max_keep``: retain only the newest N ``iter-*`` checkpoints
        (``best`` and non-iter tags are never pruned); ``None`` keeps all.
        The reference keeps every iter-N.pth forever (worker.py:221-242) —
        at ImageNet scale each save is multi-GB (atlas + Adam moments), so
        unbounded retention is a disk leak, not a feature."""
        import orbax.checkpoint as ocp

        self.ckpt_dir = os.path.abspath(ckpt_dir)
        self.max_keep = max_keep
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, tag: str) -> str:
        return os.path.join(self.ckpt_dir, tag)

    def _prune(self):
        if self.max_keep is None:
            return
        iters = []
        for name in os.listdir(self.ckpt_dir):
            if name.startswith("iter-") and os.path.isdir(self._path(name)):
                try:
                    iters.append((int(name.split("-", 1)[1]), name))
                except ValueError:
                    continue
        iters.sort()
        for _, name in iters[: max(0, len(iters) - self.max_keep)]:
            shutil.rmtree(self._path(name), ignore_errors=True)

    def save(self, tag: str, tree: Any, is_best: bool = False):
        # Multi-process: Orbax saves are COLLECTIVE — every process must call
        # save() (it syncs internally; arrays sharded across processes are
        # written shard-wise), while the filesystem bookkeeping (clear, best
        # copy, prune) stays rank-0-only, matching the reference's rank-0
        # checkpoint gating (worker.py:221-242).
        multi = jax.process_count() > 1
        path = self._path(tag)
        if jax.process_index() == 0 and os.path.exists(path):
            shutil.rmtree(path)
        if multi:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"ckpt_clear:{tag}")
        self._ckptr.save(path, tree)
        self._ckptr.wait_until_finished()
        if jax.process_index() == 0:
            if is_best:
                best = self._path("best")
                if os.path.exists(best):
                    shutil.rmtree(best)
                shutil.copytree(path, best)
            self._prune()
        if multi:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(f"ckpt_done:{tag}")

    def restore(self, tag_or_path: str, template: Any = None) -> Any:
        """Restore a checkpoint. With ``template=None`` the full saved tree is
        returned as host numpy arrays — topology-free, so a checkpoint written
        by an N-process/pod run restores on a single eval/serving host (Orbax
        pins saved device ids otherwise). With a template, leaves follow the
        template's shardings."""
        path = tag_or_path if os.path.isabs(tag_or_path) else self._path(tag_or_path)
        if template is None:
            import numpy as np
            import orbax.checkpoint as ocp

            pt = ocp.PyTreeCheckpointer()
            meta = pt.metadata(path).item_metadata.tree
            restore_args = jax.tree_util.tree_map(
                lambda m: ocp.RestoreArgs(restore_type=np.ndarray), meta
            )
            return pt.restore(path, restore_args=restore_args)
        return self._ckptr.restore(path, template)

    def exists(self, tag: str) -> bool:
        return os.path.isdir(self._path(tag))


def merge_restored(init: Any, restored: Any, name: str = "ckpt") -> Any:
    """Lax overlay of a restored tree onto a fresh-init tree, mirroring the
    reference's tolerant ``load_pretrain_model`` (utils/model.py:24-33): keys
    present in both with matching shapes come from the checkpoint; missing or
    shape-mismatched keys (e.g. a cls head with a different class count) keep
    the local initialisation and are logged instead of crashing."""
    import logging

    import numpy as np

    logger = logging.getLogger("merge_restored")
    skipped = []

    def overlay(dst, src, path=""):
        if isinstance(dst, dict):
            out = {}
            for k, v in dst.items():
                if isinstance(src, dict) and k in src:
                    out[k] = overlay(v, src[k], f"{path}/{k}")
                else:
                    skipped.append(f"{path}/{k} (missing in {name})")
                    out[k] = v
            return out
        src_shape = getattr(src, "shape", np.shape(src))
        dst_shape = getattr(dst, "shape", np.shape(dst))
        if tuple(src_shape) != tuple(dst_shape):
            skipped.append(f"{path} (shape {tuple(src_shape)} != {tuple(dst_shape)})")
            return dst
        return src

    merged = overlay(init, restored)
    for msg in skipped:
        logger.warning("keeping local init for %s", msg)
    return merged


def save_metadata(ckpt_dir: str, meta: Dict[str, Any]):
    import json

    if jax.process_index() == 0:
        with open(os.path.join(ckpt_dir, "meta.json"), "w") as f:
            json.dump(meta, f, indent=2, default=float)


def load_metadata(ckpt_dir: str) -> Optional[Dict[str, Any]]:
    import json

    path = os.path.join(ckpt_dir, "meta.json")
    if not os.path.isfile(path):
        return None
    with open(path) as f:
        return json.load(f)
