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
