"""project_timing='post' trains the same trajectory as 'pre'.

The reference runs ``schema_net.normalize()`` before EVERY train step
(worker_schema_net.py:127). Post-update projection produces the identical
alternating sequence project -> update -> project -> update ... provided the
projection is idempotent and params start projected — but lets XLA fuse the
projection into the optimizer update instead of paying a separate cross-step
HBM sweep of the [K, V, V] atlas.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from schemanet_tpu.data.datasets import build_synthetic
from schemanet_tpu.data.loader import DataLoader
from schemanet_tpu.schema.loss import get_loss_fn
from schemanet_tpu.train.trainer import Trainer, TrainerConfig


def _project(params):
    """Toy row-sum projection with the atlas projection's structure."""
    w = jnp.maximum(params["w"], 0.0)
    s = jnp.sum(w, axis=-1, keepdims=True)
    w = jnp.where(jnp.isnan(w / s), 0.0, w / s)
    return dict(params, w=w)


def test_projection_idempotent():
    rng = np.random.default_rng(0)
    p = {"w": jnp.asarray(rng.normal(size=(5, 7)).astype(np.float32))}
    once = _project(p)
    twice = _project(once)
    np.testing.assert_allclose(
        np.asarray(twice["w"]), np.asarray(once["w"]), rtol=0, atol=1e-6
    )


def _run(tmp_path, timing, steps=6):
    ds = build_synthetic(num_classes=3, num_samples=8 * steps, image_size=8)
    loader = DataLoader(
        ds, batch_size=8, split="train", seed=0, resize=8, num_workers=1
    )

    def apply_fn(p, b, image, rng, train):
        # logits through the projected simplex rows so the projection matters
        return {"pred": jnp.einsum("bc,co->bo", image.mean(axis=(1, 2)), p["w"]) }

    params = {"w": jnp.ones((3, 3)) * 0.5}
    trainer = Trainer(
        cfg=TrainerConfig(
            train_epochs=1,
            optimizer={"name": "AdamW", "lr": 0.05},
            lr_schedule={"name": "constant"},
            batch_size=8,
            project_timing=timing,
        ),
        apply_fn=apply_fn,
        loss_fn=get_loss_fn({"name": "ce_loss"}),
        loss_weights={"cls": 1.0},
        params=params,
        buffers={},
        train_loader=loader,
        val_loader=loader,
        project_params=_project,
        seed=3,
        name=f"t_{timing}",
    )
    loader.set_epoch(0)
    for batch in loader:
        trainer.train_iter(batch)
    # compare at the projected point (pre mode stores unprojected params and
    # projects at the next step's start; post stores them projected)
    return jax.device_get(_project(trainer.state.params))


def test_pre_and_post_trajectories_match(tmp_path):
    p_pre = _run(tmp_path, "pre")
    p_post = _run(tmp_path, "post")
    np.testing.assert_allclose(
        np.asarray(p_pre["w"]), np.asarray(p_post["w"]), rtol=0, atol=1e-5
    )


def test_bad_timing_rejected(tmp_path):
    with pytest.raises(AssertionError):
        _run(tmp_path, "mid")
