"""Export bundle: the functional replacement for the reference's stage-2 JIT
trace artifacts (``scripts/save_backbone_jit.py:200-203`` saves 4 TorchScript
graphs). In JAX a frozen model is params + a pure apply fn, so the bundle is
just: backbone params, the k-means codebook, and the model/VQ config — one
directory with msgpack-serialised trees + a JSON manifest.

The 4 reference traces map to bundle + code paths:
* backbone-jit                -> ViT.encode_until(encode_layer+1) w/ attn capture
* discretization-jit          -> ops.vq.vq_encode with bundle.codebook
* cls_header-jit              -> ViT.resume_from_layer(encode_layer+1)
* backbone_discretization-jit -> IngredientBackbone.classify_discretized
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np
from flax import serialization


@dataclasses.dataclass
class Bundle:
    model_cfg: Dict[str, Any]
    encode_layer: int
    img_size: int
    backbone_params: Any
    codebook: jnp.ndarray
    extra: Dict[str, Any]


def save_bundle(
    path: str,
    model_cfg: Dict[str, Any],
    encode_layer: int,
    backbone_params: Any,
    codebook,
    extra: Dict[str, Any] | None = None,
):
    os.makedirs(path, exist_ok=True)
    manifest = {
        "model_cfg": model_cfg,
        "encode_layer": int(encode_layer),
        "img_size": int(model_cfg.get("patch_embed", {}).get("img_size", 224)),
        "extra": extra or {},
        "format": "schemanet-tpu-bundle-v1",
    }
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2, default=float)
    with open(os.path.join(path, "backbone_params.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(backbone_params))
    np.save(os.path.join(path, "codebook.npy"), np.asarray(codebook, np.float32))


def load_bundle(path: str) -> Bundle:
    path = os.path.expanduser(path)
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    with open(os.path.join(path, "backbone_params.msgpack"), "rb") as f:
        backbone_params = serialization.msgpack_restore(f.read())
    codebook = jnp.asarray(np.load(os.path.join(path, "codebook.npy")))
    return Bundle(
        model_cfg=manifest["model_cfg"],
        encode_layer=manifest["encode_layer"],
        img_size=manifest["img_size"],
        backbone_params=backbone_params,
        codebook=codebook,
        extra=manifest.get("extra", {}),
    )


def save_atlas_init(path: str, atlas_params: Any, class_ingredients) -> None:
    """Initial IR-Atlas state (reference init_IR_atlas-*.pth)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    blob = {
        "params": atlas_params,
        "class_ingredients": np.asarray(class_ingredients, np.int32),
    }
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(blob))


def load_atlas_init(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())
