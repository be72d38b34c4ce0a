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


# ---------------------------------------------------------------------------
# Test tiers: modules dominated by multi-second integration/parity runs are
# marked `slow` wholesale (measured round-4 full-suite durations, 24 min
# total); `make test-fast` deselects them for a <2 min signal tier, `make
# test` runs everything. Individually slow tests elsewhere are listed too.
# ---------------------------------------------------------------------------
_SLOW_MODULES = {
    "test_multihost",            # 2-process jax.distributed setup, ~4.5 min
    "test_cli",                  # subprocess train + full stage chain
    "test_pipeline_e2e",         # 5-stage synthetic pipeline
    "test_predictor",            # full forward+grads at predictor scale
    "test_pallas_attention",     # encoder-layer training-grads parity
    "test_quant",                # int8 drift gates over full forwards
    "test_full_logit_parity",    # runs the torch reference as oracle
    "test_trained_checkpoint_parity",  # trains the torch reference
    "test_model_parity",         # torch-reference forward parity
    "test_cpp_parity",           # builds + runs the reference C++ extension
    "test_resnet",               # trains a resnet worker
    "test_parallel",             # sharded-vs-single train steps on the mesh
    "test_remat_class_gnn",
    "test_real_shape_port",      # real DeiT-Tiny-shape port + logits
    "test_encoder_block",        # whole-layer kernel parity sweeps
    "test_serve",                # trains a predictor in the module fixture
}
_SLOW_TESTS = {
    "test_mlp_dropout_mean_preserving_interpret",  # 40 interpret fwd passes
    "test_attention_dropout_gradient_interpret",
    "test_detach_forward_identical_grads_differ",
    "test_gnn_layer_fused_ln_matches_xla",
    "test_training_determinism",             # two full synthetic train runs
    "test_matcher_static_ids_end_to_end",
    "test_predictor_fused_ln_matches_xla",
    "test_worker_dtype_knob",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if (
            item.module.__name__.rsplit(".", 1)[-1] in _SLOW_MODULES
            or item.name.split("[")[0] in _SLOW_TESTS
        ):
            item.add_marker(pytest.mark.slow)
