"""Kernel policy (ops/policy.py): tuned defaults, config + env layering."""

import pytest

from schemanet_tpu.ops import policy


@pytest.fixture(autouse=True)
def _reset():
    policy.reset_policy()
    yield
    policy.reset_policy()


def test_tuned_defaults_cpu(monkeypatch):
    for var in policy._ENV.values():
        monkeypatch.delenv(var, raising=False)
    # on the CPU test env the auto table keeps the Mosaic fields on xla
    assert policy.resolve("attn") == "xla"
    assert policy.resolve("ln") == "xla"
    assert policy.resolve("mlp") == "xla"
    assert policy.resolve("symconv") == "single"
    assert policy.resolve("static_embed_bwd") == "blocked"
    assert policy.resolve("prng_impl") == "threefry"


def test_configure_and_env_layering(monkeypatch):
    monkeypatch.delenv("SCHEMANET_SYMCONV", raising=False)
    policy.configure({"symconv": "two"})
    assert policy.resolve("symconv") == "two"
    # env var overrides the configured value (A/B sweeps)
    monkeypatch.setenv("SCHEMANET_SYMCONV", "single")
    assert policy.resolve("symconv") == "single"
    monkeypatch.delenv("SCHEMANET_SYMCONV")
    assert policy.resolve("symconv") == "two"


def test_configure_rejects_unknown():
    with pytest.raises(KeyError):
        policy.configure({"nonexistent": "xla"})
    with pytest.raises(ValueError):
        policy.configure({"ln": "cuda"})


def test_worker_cfg_plumbs_kernels(monkeypatch):
    from schemanet_tpu.train.workers import LaunchArgs, _split_cfg

    monkeypatch.delenv("SCHEMANET_SYMCONV", raising=False)
    cfg = {
        "dataset": {"name": "synthetic", "num_classes": 2, "num_samples": 8,
                    "image_size": 8, "train": {}, "val": {}},
        "kernels": {"symconv": "two"},
    }
    _split_cfg(cfg, LaunchArgs())
    assert policy.resolve("symconv") == "two"


def test_backend_fns_follow_policy(monkeypatch):
    for var in policy._ENV.values():
        monkeypatch.delenv(var, raising=False)
    from schemanet_tpu.ops.pallas.attention import attention_backend
    from schemanet_tpu.ops.pallas.layernorm import layernorm_backend
    from schemanet_tpu.ops.pallas.mlp import mlp_backend

    policy.configure({"attn": "interpret", "ln": "interpret", "mlp": "xla"})
    assert attention_backend() == "interpret"
    assert layernorm_backend() == "interpret"
    assert mlp_backend() == "xla"
