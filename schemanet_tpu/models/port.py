"""Torch-checkpoint -> Flax-params porting for ViT/DeiT backbones.

The reference loads renamed official DeiT weights whose parameter names follow
its own module tree (``transformer.layers.N.attention.linear_qkv.weight`` ...,
see ``utils/model.py:10-36`` and the ``lax_names`` size-mismatch tolerance used
when the classifier head changes class count,
``config/cifar_100/vanilla/deit_tiny.yaml:43``). This module maps that naming
onto our Flax tree, with the layout conversions:

* torch Linear weight [out, in] -> flax Dense kernel [in, out]
* torch Conv2d weight [out, in, kh, kw] -> flax Conv kernel [kh, kw, in, out]
* torch pos_embed [n, 1, d] -> ours [1, n, d]
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional

import numpy as np

logger = logging.getLogger(__name__)


def _unwrap_state_dict(ckpt: Dict[str, Any]) -> Dict[str, Any]:
    """Unwrap 'model'/'student' keys and strip 'module.' prefixes (model.py:19-30)."""
    for key in ("model", "student"):
        if key in ckpt and isinstance(ckpt[key], dict):
            ckpt = ckpt[key]
    return {k.removeprefix("module."): v for k, v in ckpt.items()}


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = _unwrap_state_dict(ckpt)
    return {k: np.asarray(v.detach().cpu().numpy()) for k, v in sd.items() if hasattr(v, "detach")}


def torch_vit_to_flax(
    state_dict: Dict[str, np.ndarray], num_layers: int = 12
) -> Dict[str, Any]:
    """Build a Flax param tree from a reference-named torch state dict."""
    sd = dict(state_dict)
    params: Dict[str, Any] = {}

    def pop(name: str) -> Optional[np.ndarray]:
        return sd.pop(name, None)

    def dense(prefix: str) -> Optional[Dict[str, np.ndarray]]:
        w = pop(f"{prefix}.weight")
        if w is None:
            return None
        out = {"kernel": np.ascontiguousarray(w.T)}
        b = pop(f"{prefix}.bias")
        if b is not None:
            out["bias"] = b
        return out

    def layernorm(prefix: str) -> Optional[Dict[str, np.ndarray]]:
        w = pop(f"{prefix}.weight")
        if w is None:
            return None
        return {"scale": w, "bias": pop(f"{prefix}.bias")}

    cls_token = pop("cls_token")
    if cls_token is not None:
        params["cls_token"] = cls_token  # [1, 1, d] in both
    dist_token = pop("dist_token")
    if dist_token is not None:
        params["dist_token"] = dist_token

    conv_w = pop("patch_embed.proj.weight")
    if conv_w is not None:
        params["patch_embed"] = {
            "proj": {
                "kernel": np.transpose(conv_w, (2, 3, 1, 0)),  # OIHW -> HWIO
                "bias": pop("patch_embed.proj.bias"),
            }
        }

    pos = pop("pos_embed.pos_embed")
    if pos is not None:
        params["pos_embed"] = {"pos_embed": np.transpose(pos, (1, 0, 2))}  # [n,1,d]->[1,n,d]

    transformer: Dict[str, Any] = {}
    for i in range(num_layers):
        ref = f"transformer.layers.{i}"
        layer: Dict[str, Any] = {}
        attn = {}
        for sub in ("linear_qkv", "linear_out"):
            d = dense(f"{ref}.attention.{sub}")
            if d is not None:
                attn[sub] = d
        if attn:
            layer["attention"] = attn
        mlp = {}
        for sub in ("linear1", "linear2"):
            d = dense(f"{ref}.mlp.{sub}")
            if d is not None:
                mlp[sub] = d
        if mlp:
            layer["mlp"] = mlp
        for sub in ("norm1", "norm2"):
            ln = layernorm(f"{ref}.{sub}")
            if ln is not None:
                layer[sub] = ln
        if layer:
            transformer[f"layers_{i}"] = layer
    final_norm = layernorm("transformer.norm")
    if final_norm is not None:
        transformer["norm"] = final_norm
    if transformer:
        params["transformer"] = transformer

    for head in ("cls_head", "dist_head"):
        d = dense(head)
        if d is not None:
            params[head] = d

    leftover = [k for k in sd if not k.endswith("num_batches_tracked")]
    if leftover:
        logger.warning("unported torch parameters: %s", leftover)
    return params


def merge_pretrained(
    init_params: Dict[str, Any],
    ported: Dict[str, Any],
    lax_names: Optional[List[str]] = None,
) -> Dict[str, Any]:
    """Overlay ported params onto freshly initialised ones.

    ``lax_names`` entries (torch naming, e.g. 'cls_head.weight') keep the local
    initialisation when shapes mismatch — the reference's size-mismatch
    tolerance for class-count changes (utils/model.py:24-33).
    """
    import jax

    lax_prefixes = {n.rsplit(".", 1)[0] for n in (lax_names or [])}

    def overlay(dst, src, path=""):
        out = {}
        for k, v in dst.items():
            sub_path = f"{path}.{k}" if path else k
            if k not in src:
                out[k] = v
                continue
            if isinstance(v, dict):
                out[k] = overlay(v, src[k], sub_path)
            else:
                new = np.asarray(src[k])
                if new.shape != tuple(v.shape):
                    torch_name = sub_path.replace("layers_", "layers.").replace("/", ".")
                    if any(torch_name.startswith(p) for p in lax_prefixes) or lax_names is None:
                        logger.warning(
                            "keeping local init for %s (ckpt %s vs local %s)",
                            sub_path, new.shape, tuple(v.shape),
                        )
                        out[k] = v
                        continue
                    raise ValueError(
                        f"shape mismatch for {sub_path}: {new.shape} vs {tuple(v.shape)}"
                    )
                out[k] = new.astype(np.asarray(v).dtype)
        return out

    return jax.tree_util.tree_map(lambda x: x, overlay(init_params, ported))


def load_pretrain_into(init_params, path: str, lax_names=None, num_layers: int = 12):
    """One-shot: torch ckpt file -> flax tree merged over ``init_params``."""
    sd = load_torch_state_dict(path)
    ported = torch_vit_to_flax(sd, num_layers=num_layers)
    return merge_pretrained(init_params, ported, lax_names)
