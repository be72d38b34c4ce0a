"""Optimizer factory + LR schedule unit tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from schemanet_tpu.train.common import (
    epoch_schedule,
    make_optimizer,
    merge_trees,
    split_by_labels,
)

torch = pytest.importorskip("torch")


def test_cosine_matches_torch_per_epoch_stepping():
    """Without warmup, our per-epoch cosine equals torch CosineAnnealingLR
    stepped once per epoch (the reference's usage, worker.py:256)."""
    base_lr, t_max, eta_min, spe = 1e-3, 50, 1e-5, 7
    sched = epoch_schedule("cosine_annealing", base_lr, spe, t_max, 0, eta_min, t_max)

    m = torch.nn.Linear(2, 2)
    opt = torch.optim.SGD(m.parameters(), lr=base_lr)
    tsched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=t_max, eta_min=eta_min)
    for epoch in range(t_max):
        want = tsched.get_last_lr()[0]
        for step_in_epoch in (0, spe - 1):
            got = float(sched(jnp.asarray(epoch * spe + step_in_epoch)))
            np.testing.assert_allclose(got, want, rtol=1e-5, err_msg=f"epoch {epoch}")
        opt.step()
        tsched.step()


def test_warmup_ramp():
    sched = epoch_schedule("cosine_annealing", 1.0, 1, 50, warmup_iters=10)
    lrs = [float(sched(jnp.asarray(e))) for e in range(12)]
    np.testing.assert_allclose(lrs[0], 0.1, rtol=1e-6)  # (e+1)/warmup
    np.testing.assert_allclose(lrs[9], 1.0, rtol=1e-6)
    np.testing.assert_allclose(lrs[10], 1.0, rtol=1e-6)  # cosine peak at warmup end
    assert lrs[11] < 1.0  # decay begins after the peak


def test_param_group_labels_and_split():
    params = {
        "schema_net": {"vertex_weights": jnp.ones((2, 3)), "edge_weights": jnp.ones((2, 3, 3))},
        "matcher": {"gnn": {"embedding": jnp.ones((4, 2))}},
        "backbone": {"cls_token": jnp.ones((1, 1, 2))},
    }
    groups = [
        {"pattern": "schema_net", "cfg": {"weight_decay": 5e-4}},
        {"pattern": "matcher"},
    ]
    tx, labels = make_optimizer(
        params, {"name": "AdamW", "lr": 1e-3, "weight_decay": 0.05},
        schedule=lambda s: 1e-3, param_groups=groups, drop_remain=True,
    )
    assert labels["schema_net"]["vertex_weights"] == "group_0"
    assert labels["matcher"]["gnn"]["embedding"] == "group_1"
    assert labels["backbone"]["cls_token"] == "frozen"

    train, frozen = split_by_labels(params, labels)
    assert "backbone" not in train and "backbone" in frozen
    assert "schema_net" in train and "schema_net" not in frozen
    merged = merge_trees(frozen, train)
    assert set(merged) == {"schema_net", "matcher", "backbone"}

    # frozen params receive zero update through the full tx
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    np.testing.assert_allclose(np.asarray(updates["backbone"]["cls_token"]), 0.0)
    assert float(jnp.abs(updates["schema_net"]["vertex_weights"]).sum()) > 0


def test_per_group_lr_scale():
    params = {"a": {"w": jnp.ones(3)}, "b": {"w": jnp.ones(3)}}
    groups = [{"pattern": "a", "cfg": {"lr": 1e-2}}, {"pattern": "b"}]
    tx, _ = make_optimizer(
        params, {"name": "sgd", "lr": 1e-3}, schedule=lambda s: jnp.asarray(1e-3),
        param_groups=groups,
    )
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # group a runs at 10x the base lr
    ratio = float(updates["a"]["w"][0] / updates["b"]["w"][0])
    np.testing.assert_allclose(ratio, 10.0, rtol=1e-5)


def test_resume_auto_fresh_start(tmp_path):
    """resume='auto' with no prior checkpoint is a clean fresh start."""
    import jax.numpy as jnp

    from schemanet_tpu.data.datasets import build_synthetic
    from schemanet_tpu.data.loader import DataLoader
    from schemanet_tpu.train.trainer import Trainer, TrainerConfig

    ds = build_synthetic(num_classes=3, num_samples=16, image_size=8)
    loader = DataLoader(ds, batch_size=8, split="train", seed=0, resize=8, num_workers=1)

    def apply_fn(p, b, image, rng, train):
        return {"pred": jnp.einsum("bc,co->bo", image.mean(axis=(1, 2)), p["w"])}

    params = {"w": jnp.zeros((3, 3))}
    from schemanet_tpu.schema.loss import get_loss_fn

    trainer = Trainer(
        cfg=TrainerConfig(train_epochs=1, optimizer={"name": "sgd", "lr": 0.1},
                          lr_schedule={"name": "constant"}, batch_size=8),
        apply_fn=apply_fn,
        loss_fn=get_loss_fn({"name": "ce_loss"}),
        loss_weights={"cls": 1.0},
        params=params,
        buffers={},
        train_loader=loader,
        val_loader=loader,
        ckpt_dir=str(tmp_path / "ckpt"),
        resume="auto",
    )
    assert trainer.start_epoch == 0  # fresh start, no crash


def test_training_determinism(tmp_path):
    """Two runs with the same seed produce bit-identical trained params
    (the reference's make_deterministic story, worker.py:320-323)."""
    import jax

    from schemanet_tpu.train.workers import LaunchArgs, WORKER_REGISTRY

    cfg = {
        "dataset": {"name": "synthetic", "root": "", "train": {"split": "train"},
                    "val": {"split": "val"}, "resize": 16, "num_classes": 3,
                    "num_samples": 32, "image_size": 16},
        "training": {"optimizer": {"name": "AdamW", "lr": 1e-3},
                     "lr_schedule": {"name": "constant"}, "train_epochs": 1,
                     "print_interval": 100, "val_interval": 1000,
                     "batch_size": 8, "num_workers": 1},
        "validation": {"batch_size": 8, "num_workers": 1},
        "model": {
            "name": "vit",
            "transformer": {"embed_dim": 16, "num_encoder_layers": 2, "num_heads": 2,
                            "dim_feedforward": 32, "dropout": 0.1, "activation": "gelu",
                            "final_norm": True, "norm_eps": 1e-6},
            "patch_embed": {"img_size": 16, "patch_size": 8, "image_channels": 3},
            "pos_encoding": {"name": "learnable"},
        },
        "loss": {"name": "ce_loss", "weight_dict": {"cls": 1.0}},
    }

    def run(tag):
        res = WORKER_REGISTRY.get("backbone_worker")(
            cfg, LaunchArgs(seed=7, log_dir=str(tmp_path / tag))
        )
        return jax.device_get(res["trainer"].state.params)

    p1, p2 = run("a"), run("b")
    for (k1, v1), (k2, v2) in zip(
        jax.tree_util.tree_leaves_with_path(p1), jax.tree_util.tree_leaves_with_path(p2)
    ):
        np.testing.assert_array_equal(
            np.asarray(v1), np.asarray(v2), err_msg=jax.tree_util.keystr(k1)
        )


def test_merge_restored_lax_overlay():
    import numpy as np

    from schemanet_tpu.train.common import merge_restored

    init = {
        "backbone": {"kernel": np.zeros((4, 4))},
        "cls_head": {"kernel": np.zeros((4, 13)), "bias": np.zeros((13,))},
        "extra": np.zeros((2,)),
    }
    restored = {
        "backbone": {"kernel": np.ones((4, 4))},
        "cls_head": {"kernel": np.ones((4, 7)), "bias": np.ones((7,))},  # 7 != 13
    }
    merged = merge_restored(init, restored)
    assert (merged["backbone"]["kernel"] == 1).all()  # matching -> from ckpt
    assert merged["cls_head"]["kernel"].shape == (4, 13)  # mismatch -> local
    assert (merged["cls_head"]["kernel"] == 0).all()
    assert (merged["extra"] == 0).all()  # missing -> local


def test_low_memory_moment_options():
    # moment_dtype: bfloat16 -> mu stored bf16; factored: true -> adafactor
    # (no full-rank second moment). Both must still produce descent updates.
    params = {"a": {"w": jnp.ones((4, 4))}}
    grads = jax.tree_util.tree_map(lambda p: jnp.full_like(p, 0.5), params)

    tx, _ = make_optimizer(
        params, {"name": "AdamW", "lr": 1e-3, "moment_dtype": "bfloat16"},
        schedule=lambda s: jnp.asarray(1e-3),
    )
    state = tx.init(params)
    mu_leaves = [
        leaf for leaf in jax.tree_util.tree_leaves(state)
        if hasattr(leaf, "dtype") and leaf.dtype == jnp.bfloat16
    ]
    assert mu_leaves, "bf16 first moment not found in optimizer state"
    updates, _ = tx.update(grads, state, params)
    assert float(updates["a"]["w"][0, 0]) < 0

    tx_f, _ = make_optimizer(
        params, {"name": "AdamW", "lr": 1e-3, "factored": True},
        schedule=lambda s: jnp.asarray(1e-3),
    )
    state_f = tx_f.init(params)
    # adafactor keeps no [4,4] second-moment tensor for a factored 2D param
    full_rank = [
        leaf for leaf in jax.tree_util.tree_leaves(state_f)
        if hasattr(leaf, "shape") and leaf.shape == (4, 4) and leaf.dtype == jnp.float32
    ]
    updates_f, _ = tx_f.update(grads, state_f, params)
    assert float(updates_f["a"]["w"][0, 0]) < 0


def test_factored_weight_decay_is_schedule_scaled():
    # `factored: true` must keep AdamW's decoupled, schedule-scaled decay
    # (update -= lr_t * wd * p), not adafactor's fixed per-step
    # weight_decay_rate: with a zero gradient and zero-ish adafactor update,
    # the decay term alone should scale with the schedule value.
    params = {"w": jnp.full((4, 4), 2.0)}
    grads = {"w": jnp.zeros((4, 4))}
    wd = 0.1

    def run(lr):
        tx, _ = make_optimizer(
            params,
            {"name": "AdamW", "lr": 1e-3, "weight_decay": wd, "factored": True},
            schedule=lambda s: jnp.asarray(lr),
        )
        updates, _ = tx.update(grads, tx.init(params), params)
        return float(updates["w"][0, 0])

    u_small, u_big = run(1e-4), run(1e-2)
    np.testing.assert_allclose(u_small, -1e-4 * wd * 2.0, rtol=1e-5)
    np.testing.assert_allclose(u_big, -1e-2 * wd * 2.0, rtol=1e-5)
    # and an explicit weight_decay of 0.0 means genuinely no decay
    tx0, _ = make_optimizer(
        params,
        {"name": "AdamW", "lr": 1e-3, "weight_decay": 0.0, "factored": True},
        schedule=lambda s: jnp.asarray(1e-2),
    )
    upd0, _ = tx0.update(grads, tx0.init(params), params)
    np.testing.assert_allclose(float(upd0["w"][0, 0]), 0.0, atol=1e-12)


def test_adamw_lowmem_matches_adamw_when_disabled():
    # with every lowmem knob off, adamw_lowmem must trace the exact optax.adamw
    # update sequence (multi-step, bias corrections included)
    from schemanet_tpu.train.common import adamw_lowmem

    rng = np.random.default_rng(0)
    params = {"w": jnp.asarray(rng.normal(size=(6, 5)), jnp.float32),
              "b": jnp.asarray(rng.normal(size=(5,)), jnp.float32)}
    ref_tx = optax.adamw(1e-3, weight_decay=0.05)
    new_tx = adamw_lowmem(1e-3, weight_decay=0.05)
    ref_state, new_state = ref_tx.init(params), new_tx.init(params)
    p_ref = p_new = params
    for step in range(5):
        grads = jax.tree_util.tree_map(
            lambda p: jnp.asarray(rng.normal(size=p.shape), jnp.float32), params
        )
        u_ref, ref_state = ref_tx.update(grads, ref_state, p_ref)
        u_new, new_state = new_tx.update(grads, new_state, p_new)
        p_ref = optax.apply_updates(p_ref, u_ref)
        p_new = optax.apply_updates(p_new, u_new)
        for k in params:
            np.testing.assert_allclose(
                np.asarray(p_new[k]), np.asarray(p_ref[k]), rtol=2e-6, atol=1e-7,
                err_msg=f"step {step} param {k}",
            )


def test_adamw_lowmem_factored_rank1_exact():
    # Adafactor's nu_hat = r c^T / sum(r) is EXACT when g^2 is rank-1 — a
    # first step with g = outer(u, v) must match the full-nu update exactly
    from schemanet_tpu.train.common import adamw_lowmem

    rng = np.random.default_rng(1)
    u, v = rng.normal(size=(8, 1)), rng.normal(size=(1, 8))
    params = {"w": jnp.zeros((8, 8), jnp.float32)}
    grads = {"w": jnp.asarray(u * v, jnp.float32)}

    full_tx = adamw_lowmem(1e-3)
    fac_tx = adamw_lowmem(1e-3, factored_min_size=4)
    uf, _ = full_tx.update(grads, full_tx.init(params), params)
    ua, _ = fac_tx.update(grads, fac_tx.init(params), params)
    np.testing.assert_allclose(np.asarray(ua["w"]), np.asarray(uf["w"]), rtol=1e-5)


def test_adamw_lowmem_state_layout_and_descent():
    from schemanet_tpu.train.common import adamw_lowmem

    params = {"big": jnp.ones((16, 8, 8)), "small": jnp.ones((3,))}
    tx = adamw_lowmem(
        1e-2, mu_dtype=jnp.bfloat16, nu_dtype=jnp.bfloat16, factored_min_size=8
    )
    state = tx.init(params)
    scale_state = state[0]  # scale_by_adam_lowmem is first in the chain
    nu = scale_state.nu
    assert set(nu["big"]) == {"row", "col"}
    assert nu["big"]["row"].shape == (16, 8) and nu["big"]["col"].shape == (16, 8)
    assert set(nu["small"]) == {"full"}
    assert nu["small"]["full"].dtype == jnp.bfloat16
    assert scale_state.mu["big"].dtype == jnp.bfloat16

    # descent on a quadratic: ||p||^2/2, gradient = p
    p = params
    for _ in range(50):
        g = p
        upd, state = tx.update(g, state, p)
        p = optax.apply_updates(p, upd)
    assert float(jnp.abs(p["big"]).mean()) < 0.75
    assert float(jnp.abs(p["small"]).mean()) < 0.75


def test_per_group_lowmem_moment_overrides():
    # a param-group cfg carrying nu_dtype / nu_factored_min_size must route
    # that group (and only it) through adamw_lowmem
    params = {
        "schema_net": {"edge_weights": jnp.ones((4, 8, 8))},
        "matcher": {"w": jnp.ones((8, 8))},
    }
    tx, labels = make_optimizer(
        params,
        {"name": "AdamW", "lr": 1e-3},
        schedule=lambda s: jnp.asarray(1e-3),
        param_groups=[
            {
                "pattern": r"schema_net\.edge_weights",
                "cfg": {"nu_dtype": "bfloat16", "nu_factored_min_size": 8,
                        "moment_dtype": "bfloat16"},
            }
        ],
    )
    assert labels["schema_net"]["edge_weights"] == "group_0"
    assert labels["matcher"]["w"] == "default"
    state = tx.init(params)
    leaves = jax.tree_util.tree_leaves(state)
    # factored row/col stats for the [4, 8, 8] edge tensor exist...
    assert any(getattr(l, "shape", None) == (4, 8) for l in leaves)
    # ...and the only full-rank [4,8,8] moment is the bf16 mu — no full nu
    full_rank = [
        l for l in leaves
        if getattr(l, "shape", None) == (4, 8, 8) and jnp.issubdtype(l.dtype, jnp.floating)
    ]
    assert len(full_rank) == 1 and full_rank[0].dtype == jnp.bfloat16
    grads = jax.tree_util.tree_map(lambda p: jnp.full_like(p, 0.25), params)
    updates, _ = tx.update(grads, state, params)
    assert float(updates["schema_net"]["edge_weights"][0, 0, 0]) < 0
    assert float(updates["matcher"]["w"][0, 0]) < 0


def test_checkpoint_retention_keeps_best(tmp_path):
    # max_keep prunes the oldest iter-* checkpoints but never `best`
    from schemanet_tpu.train.common import CheckpointManager

    mgr = CheckpointManager(str(tmp_path), max_keep=2)
    tree = {"w": jnp.ones((2,))}
    mgr.save("iter-100", tree, is_best=True)
    mgr.save("iter-200", tree)
    mgr.save("iter-300", tree)
    mgr.save("iter-1000", tree)  # numeric sort: 1000 > 300 despite lexicographic
    assert mgr.exists("best")
    assert not mgr.exists("iter-100")
    assert not mgr.exists("iter-200")
    assert mgr.exists("iter-300") and mgr.exists("iter-1000")
    # best remains restorable even though its source iter dir was pruned
    restored = mgr.restore("best")
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.ones((2,)))
    # max_keep=None keeps everything
    mgr_all = CheckpointManager(str(tmp_path / "all"), max_keep=None)
    for i in range(4):
        mgr_all.save(f"iter-{i}", tree)
    assert all(mgr_all.exists(f"iter-{i}") for i in range(4))


def test_worker_dtype_knob(tmp_path):
    # training.dtype selects the compute dtype of the built model (params fp32)
    from schemanet_tpu.train.workers import WORKER_REGISTRY, LaunchArgs, resolve_dtype

    assert resolve_dtype("bfloat16") == jnp.bfloat16
    assert resolve_dtype(None) == jnp.float32

    cfg = {
        "dataset": {"name": "synthetic", "root": "", "train": {"split": "train"},
                    "val": {"split": "val"}, "resize": 16, "num_classes": 2,
                    "num_samples": 16, "image_size": 16},
        "training": {"optimizer": {"name": "AdamW", "lr": 1e-3},
                     "lr_schedule": {"name": "constant"}, "train_epochs": 1,
                     "print_interval": 100, "val_interval": 1000,
                     "batch_size": 8, "num_workers": 0, "dtype": "bfloat16"},
        "validation": {"batch_size": 8, "num_workers": 0},
        "model": {"name": "vit",
                  "transformer": {"embed_dim": 16, "num_encoder_layers": 1,
                                  "num_heads": 2, "dim_feedforward": 32,
                                  "dropout": None, "activation": "gelu",
                                  "final_norm": True, "norm_eps": 1e-6},
                  "patch_embed": {"img_size": 16, "patch_size": 8,
                                  "image_channels": 3},
                  "pos_encoding": {"name": "learnable"}},
        "loss": {"name": "ce_loss", "weight_dict": {"cls": 1.0}},
    }
    out = WORKER_REGISTRY.get("backbone_worker")(
        cfg, LaunchArgs(seed=0, log_dir=str(tmp_path / "bf16")))
    assert out["model"].dtype == jnp.bfloat16
    # params remain fp32 master copies
    leaf = jax.tree_util.tree_leaves(out["trainer"].state.params)[0]
    assert leaf.dtype == jnp.float32


def test_rbg_prng_knob(monkeypatch):
    """SCHEMANET_PRNG_IMPL=rbg swaps the training PRNG stream to XLA's
    RngBitGenerator; dropout masks stay valid (keep-rate ~1-p, scaled)."""
    from schemanet_tpu.train.common import make_train_prng

    monkeypatch.setenv("SCHEMANET_PRNG_IMPL", "rbg")
    try:
        k = make_train_prng(0)
        assert k.shape == (4,)  # rbg key data (threefry would be (2,))
        # split / fold_in / bernoulli all work on the rbg impl
        a, b = jax.random.split(k)
        sub = jax.random.fold_in(a, 3)
        keep = jax.random.bernoulli(sub, 0.9, (4096,))
        rate = float(np.mean(np.asarray(keep)))
        assert 0.85 < rate < 0.95
        # flax Dropout consumes the rbg stream end to end
        import flax.linen as nn

        drop = nn.Dropout(0.5)
        x = jnp.ones((128, 64))
        y = drop.apply({}, x, deterministic=False, rngs={"dropout": b})
        vals = np.unique(np.asarray(y))
        assert set(np.round(vals, 4)).issubset({0.0, 2.0})
    finally:
        jax.config.update("jax_default_prng_impl", "threefry2x32")
    monkeypatch.delenv("SCHEMANET_PRNG_IMPL")
    assert make_train_prng(0).shape == (2,)  # knob off -> default threefry
