"""ResNet family ('official_models' registry entry): shapes, BN stats, training."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from schemanet_tpu.models.vit import get_model

torch = pytest.importorskip("torch")


@pytest.mark.parametrize("name,params_ref", [("resnet18", 11689512), ("resnet50", 25557032)])
def test_resnet_param_counts_match_torchvision_arch(name, params_ref):
    """Parameter counts equal the canonical torchvision architectures."""
    from schemanet_tpu.utils.metrics import count_parameters

    model = get_model({"name": name}, 1000)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    n = count_parameters(variables["params"])
    # torchvision counts include BN affine; ours live in params too. Running
    # stats live in batch_stats (not counted by torchvision either).
    assert n == params_ref, n


def test_official_models_dispatch(rng):
    model = get_model({"name": "official_models", "model_name": "resnet18"}, 7)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out["pred"].shape == (2, 7)
    assert "batch_stats" in variables


def test_resnet_train_updates_batch_stats(rng):
    model = get_model({"name": "resnet18"}, 4)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out, mutated = model.apply(
        variables, x, deterministic=False, mutable=["batch_stats"]
    )
    before = np.asarray(variables["batch_stats"]["bn1"]["mean"])
    after = np.asarray(mutated["batch_stats"]["bn1"]["mean"])
    assert not np.allclose(before, after)


def test_resnet_backbone_worker_trains(tmp_path):
    """End-to-end worker training with a BN model (mutable buffers path)."""
    from schemanet_tpu.train.workers import LaunchArgs, WORKER_REGISTRY

    cfg = {
        "dataset": {"name": "synthetic", "root": "", "train": {"split": "train"},
                    "val": {"split": "val"}, "resize": 32, "num_classes": 3,
                    "num_samples": 48, "image_size": 32},
        "training": {"optimizer": {"name": "AdamW", "lr": 1e-3},
                     "lr_schedule": {"name": "constant"}, "train_epochs": 2,
                     "print_interval": 100, "val_interval": 1000,
                     "batch_size": 16, "num_workers": 1},
        "validation": {"batch_size": 16, "num_workers": 1},
        "model": {"name": "resnet18"},
        "loss": {"name": "ce_loss", "weight_dict": {"cls": 1.0}},
    }
    res = WORKER_REGISTRY.get("backbone_worker")(
        cfg, LaunchArgs(seed=0, log_dir=str(tmp_path))
    )
    trainer = res["trainer"]
    # BN running stats were updated during training
    stats = jax.device_get(trainer.state.buffers)
    assert not np.allclose(np.asarray(stats["bn1"]["mean"]), 0.0)
    assert res["eval"]["acc"][1] >= 0.0


def test_resnet_capture_probe(rng):
    model = get_model({"name": "resnet18"}, 3)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x, capture=("layer2.out",))
    assert "layer2.out" in out["captured"]
