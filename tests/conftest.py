"""Test config: force an 8-device virtual CPU mesh BEFORE jax backends initialise.

Multi-chip semantics are validated on host CPU devices
(``--xla_force_host_platform_device_count=8``) since real multi-chip hardware
is unavailable in CI; the ops are platform-agnostic XLA programs.

Note: the axon TPU plugin's sitecustomize prepends ``axon`` to
``jax_platforms`` regardless of the env var, so we must override the config
value itself before any backend is created.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

assert jax.devices()[0].platform == "cpu", "tests must run on host CPU devices"
assert jax.device_count() == 8, "expected the 8-device virtual CPU mesh"


@pytest.fixture
def rng():
    return np.random.default_rng(0)
