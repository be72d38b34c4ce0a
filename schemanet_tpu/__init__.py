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
