"""Fused AdamW+projection kernel (ops/pallas/atlas_opt.py) vs the unfused
oracle: optax.adamw followed by the ``project_atlas_params`` normalisation
(reference normalize(), schema_net.py:133-142).

The fused kernel moves the projection from "before every step" to "after the
previous step's update" — with params projected once up front, the sequence
of projected params (what the gradient sees) must match the unfused schedule
step for step, including Adam's bias-corrected moments.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from schemanet_tpu.ops.pallas.atlas_opt import adamw_project_rows


def _project(p, remove_self_loop=False):
    w = jnp.maximum(p, 0.0)
    s = jnp.sum(w, axis=-1, keepdims=True)
    out = jnp.where(jnp.isnan(w / s), 0.0, w / s)
    if remove_self_loop:
        eye = jnp.eye(out.shape[-1], dtype=bool)
        out = jnp.where(eye, 0.0, out)
    return out


HYPERS = dict(learning_rate=1e-3, b1=0.9, b2=0.999, eps=1e-8, weight_decay=1e-4)


@pytest.mark.parametrize(
    "shape,remove_self_loop",
    [((6, 40, 40), False), ((6, 40, 40), True), ((11, 40), False)],
)
def test_matches_optax_plus_projection(shape, remove_self_loop):
    rng = np.random.default_rng(3)
    tx = optax.adamw(**HYPERS)

    p0 = jnp.asarray(rng.normal(0.5, 0.2, size=shape).astype(np.float32))
    p_ref = _project(p0, remove_self_loop)
    state = tx.init(p_ref)
    p_fused = p_ref
    m = jnp.zeros(shape, jnp.float32)
    v = jnp.zeros(shape, jnp.float32)

    for step in range(4):
        g = jnp.asarray(rng.normal(0.0, 0.05, size=shape).astype(np.float32))

        # oracle: update at the projected point, then project (what the next
        # step's gradient would see under the reference's pre-step normalize)
        updates, state = tx.update(g, state, p_ref)
        p_ref = _project(optax.apply_updates(p_ref, updates), remove_self_loop)

        p_fused, m, v = adamw_project_rows(
            p_fused, g, m, v, jnp.asarray(step, jnp.int32),
            lr=HYPERS["learning_rate"], b1=HYPERS["b1"], b2=HYPERS["b2"],
            eps=HYPERS["eps"], weight_decay=HYPERS["weight_decay"],
            remove_self_loop=remove_self_loop, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(p_fused), np.asarray(p_ref), rtol=2e-6, atol=2e-7,
            err_msg=f"step {step}",
        )
        np.testing.assert_allclose(
            np.asarray(m), np.asarray(state[0].mu), rtol=1e-6, atol=1e-8
        )
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(state[0].nu), rtol=1e-6, atol=1e-10
        )


def test_all_zero_row_maps_to_zero():
    # a row driven fully negative projects to 0/0 -> the nan_to_num(0)
    # convention of graph/utils.py:25-34
    p = jnp.asarray([[-1.0, -2.0, -3.0, -4.0], [1.0, 1.0, 1.0, 1.0]], jnp.float32)
    z = jnp.zeros_like(p)
    out, _, _ = adamw_project_rows(
        p, z, z, z, jnp.asarray(0, jnp.int32), lr=0.0, weight_decay=0.0,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(out[0]), np.zeros(4, np.float32))
    np.testing.assert_allclose(np.asarray(out[1]), np.full(4, 0.25, np.float32))


def test_traced_lr_schedule():
    # lr arrives as a traced scalar (cosine schedule in the trainer)
    rng = np.random.default_rng(0)
    shape = (4, 24, 24)
    p = _project(jnp.asarray(rng.random(shape, np.float32)))
    g = jnp.asarray(rng.normal(0, 0.1, shape).astype(np.float32))
    z = jnp.zeros(shape, jnp.float32)

    @jax.jit
    def step(lr):
        return adamw_project_rows(
            p, g, z, z, jnp.asarray(0, jnp.int32), lr=lr, interpret=True
        )[0]

    a = step(jnp.float32(1e-3))
    b = step(jnp.float32(1e-2))
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_tpu_lowering():
    # Mosaic lowering check without hardware (the test_pallas_mlp.py trick)
    shape = (4, 64, 64)
    p = jnp.ones(shape, jnp.float32)
    z = jnp.zeros(shape, jnp.float32)

    def f(p):
        return adamw_project_rows(
            p, z, z, z, jnp.asarray(0, jnp.int32), lr=1e-3,
            remove_self_loop=True,
        )[0]

    jax.jit(f).trace(p).lower(lowering_platforms=("tpu",))


def test_trainer_fused_vs_unfused_end_to_end(tmp_path):
    """The Trainer(fused_atlas=...) wiring reproduces the unfused trainer's
    projected-parameter trajectory: same grads (clipped by the same global
    norm over ALL leaves), same Adam moments, same cosine schedule step
    alignment. Compares proj(unfused params) == fused params after 4 steps."""
    from schemanet_tpu.data.datasets import build_synthetic
    from schemanet_tpu.data.loader import DataLoader
    from schemanet_tpu.schema.loss import get_loss_fn
    from schemanet_tpu.train.trainer import Trainer, TrainerConfig

    K, V = 4, 16
    rng = np.random.default_rng(11)
    init_params = {
        "net": {
            "w": jnp.asarray(rng.normal(0, 0.3, (3, V)).astype(np.float32)),
            "vertex_weights": jnp.asarray(rng.random((K, V), np.float32)),
            "edge_weights": jnp.asarray(rng.random((K, V, V), np.float32)),
        }
    }

    def apply_fn(p, b, image, step_rng, train):
        net = p["net"]
        h = image.mean(axis=(1, 2)) @ net["w"]  # [B, V]
        logit_v = h @ net["vertex_weights"].T  # [B, K]
        logit_e = jnp.einsum("bv,kvw,bw->bk", h, net["edge_weights"], h)
        return {"pred": logit_v + 0.1 * logit_e}

    def proj(tp):
        net = dict(tp["net"])
        net["vertex_weights"] = _project(net["vertex_weights"])
        net["edge_weights"] = _project(net["edge_weights"], remove_self_loop=True)
        return dict(tp, net=net)

    wd = 1e-4

    def build(tag, fused):
        ds = build_synthetic(num_classes=K, num_samples=32, image_size=8)
        loader = DataLoader(ds, batch_size=8, split="train", seed=0, resize=8,
                            num_workers=1)
        spec = None
        if fused:
            spec = {
                "subtree": "net",
                "hot": {"vertex_weights": False, "edge_weights": True},
                "lr_scale": 1.0,
                "weight_decay": wd,
                "clamp": lambda tp: tp,  # no attr tensors in this toy net
                "interpret": True,  # CPU-runnable Mosaic
            }
        return Trainer(
            cfg=TrainerConfig(
                train_epochs=2,
                optimizer={"name": "AdamW", "lr": 1e-2, "weight_decay": wd},
                lr_schedule={"name": "cosine_annealing", "warmup_iters": 2},
                batch_size=8,
                clip_max_norm=1.0,
            ),
            apply_fn=apply_fn,
            loss_fn=get_loss_fn({"name": "ce_loss"}),
            loss_weights={"cls": 1.0},
            params=jax.tree_util.tree_map(jnp.array, init_params),
            buffers={},
            train_loader=loader,
            val_loader=loader,
            log_dir=str(tmp_path / tag),
            project_params=proj,
            fused_atlas=spec,
        )

    ref, fus = build("ref", fused=False), build("fus", fused=True)
    ref.train_loader.set_epoch(0)
    fus.train_loader.set_epoch(0)
    for (ba, bb) in zip(ref.train_loader, fus.train_loader):
        np.testing.assert_array_equal(np.asarray(ba["image"]), np.asarray(bb["image"]))
        ma = ref.train_iter(ba)
        mb = fus.train_iter(bb)
        np.testing.assert_allclose(
            float(ma["loss"]), float(mb["loss"]), rtol=1e-5,
            err_msg="losses diverged (grads seen at different points)",
        )

    want = proj(jax.device_get(ref.state.params))  # projected view of raw params
    got = jax.device_get(fus.state.params)  # stored projected by construction
    for k in ("vertex_weights", "edge_weights", "w"):
        np.testing.assert_allclose(
            np.asarray(want["net"][k]), np.asarray(got["net"][k]),
            rtol=2e-4, atol=2e-6, err_msg=k,
        )
    # Adam moments of the hot tensors match the unfused optimizer's
    inner = jax.device_get(ref.state.opt_state)
    flat = jax.tree_util.tree_leaves_with_path(inner)
    mus = {jax.tree_util.keystr(p): v for p, v in flat if ".mu" in jax.tree_util.keystr(p)}
    vw_mu = next(v for k, v in mus.items() if "vertex_weights" in k)
    np.testing.assert_allclose(
        np.asarray(vw_mu),
        np.asarray(jax.device_get(fus.state.opt_state["m"]["vertex_weights"])),
        rtol=2e-4, atol=2e-6,
    )
