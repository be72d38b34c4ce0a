"""SchemaNet-TPU: a TPU-native framework for Schema Inference for Interpretable
Image Classification (ICLR 2023).

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the PyTorch
reference ``zhfeing/SchemaNet-PyTorch``. The reference's CUDA/C++/DDP design is
replaced by:

* dense, fixed-shape XLA graph-building ops instead of ragged CPU C++ kernels
  (reference: ``cpp_extension/src/*.cpp``),
* pure-function Flax ViT/DeiT backbones with declarative intermediate capture
  instead of forward hooks (reference: ``models/transformer/mha.py`` probe
  Identities),
* a single-controller ``jax.sharding.Mesh`` data/model-parallel train step
  instead of ``dist_engine.py`` + torch DDP/NCCL,
* on-device minibatch k-means instead of sklearn (reference:
  ``scripts/extract_ingredients.py``).
"""

__version__ = "0.1.0"


def _enable_compilation_cache():
    """Point JAX's persistent compilation cache at a writable directory.

    Recompiling the fused train step over the chip tunnel costs minutes per
    process launch (bench runs, pipeline stages, workers are separate
    processes); the disk cache makes every launch after the first near-free.
    Opt out with SCHEMANET_COMPILE_CACHE=0, or override the location by
    exporting JAX_COMPILATION_CACHE_DIR yourself. Backends whose executables
    can't be serialised simply skip the cache (JAX handles that internally).

    Implemented via env vars (not ``jax.config.update``) so that importing
    ``schemanet_tpu`` never imports jax — JAX reads these at its own import
    time, keeping the documented lazy-import design intact.
    """
    import os

    if os.environ.get("SCHEMANET_COMPILE_CACHE", "1") == "0":
        return
    if "JAX_COMPILATION_CACHE_DIR" in os.environ:
        return
    if "jax" in __import__("sys").modules:
        # jax already configured itself from the env; late env edits would be
        # ignored, so set the config directly on the live module instead
        _configure_live_jax_cache()
        return
    cache_dir = _cache_dir()
    if cache_dir is None:
        return
    os.environ["JAX_COMPILATION_CACHE_DIR"] = cache_dir
    # cache everything that took non-trivial compile time
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")


def _cache_dir():
    """Repo-local ``.jax_cache`` when the checkout is writable, else a user
    cache dir (a pip-installed copy may live on a read-only / shared tree)."""
    import os

    repo_local = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache")
    for candidate in (
        repo_local,
        os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "schemanet_tpu",
            "jax",
        ),
    ):
        try:
            os.makedirs(candidate, exist_ok=True)
            probe = os.path.join(candidate, ".write_probe")
            with open(probe, "w"):
                pass
            os.remove(probe)
            return candidate
        except OSError:
            continue
    return None  # nowhere writable: run without a persistent cache


def _configure_live_jax_cache():  # pragma: no cover - import-order dependent
    import sys

    cache_dir = _cache_dir()
    if cache_dir is None:
        return
    try:
        jax = sys.modules["jax"]
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass


_enable_compilation_cache()


def __getattr__(name):
    """Lazy top-level API (keeps `import schemanet_tpu` light)."""
    import importlib

    top = {
        "models": ".models",
        "ops": ".ops",
        "schema": ".schema",
        "data": ".data",
        "parallel": ".parallel",
        "train": ".train",
        "pipeline": ".pipeline",
        "utils": ".utils",
        "serve": ".serve",
    }
    if name in top:
        return importlib.import_module(top[name], __name__)
    symbol_homes = {
        "get_model": ".models",
        "build_predictor": ".schema",
        "get_loss_fn": ".schema",
        "Trainer": ".train",
        "ServePredictor": ".serve",
        "load_serve_predictor": ".serve",
        "make_mesh": ".parallel",
    }
    if name in symbol_homes:
        return getattr(importlib.import_module(symbol_homes[name], __name__), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
