"""ViT / DeiT backbones (reference ``models/vision_transformers/{vit,deit}.py``).

Differences from the reference, by design:
* batch-major [bs, n, dim] layout (see models/layers.py docstring);
* intermediate activations are returned via the ``capture`` argument instead of
  nn.Identity probes + hooks (reference relies on
  ``module.transformer.layers.9`` hook names, ``2.save_backbone_jit.sh:15``);
* inputs are NHWC images.

Token layout matches the reference: [cls, patches...] for ViT and
[cls, dist, patches...] for DeiT; the learnable positional table covers the
full token sequence (vision_transformers/__init__.py:13-16).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..utils.registry import Registry
from .layers import IdentityPosEncoding, LearnablePosEncoding, PatchEmbed
from .transformer import Transformer


class ViT(nn.Module):
    num_classes: int
    img_size: int = 224
    patch_size: int = 16
    image_channels: int = 3
    embed_dim: int = 192
    num_encoder_layers: int = 12
    num_heads: int = 3
    dim_feedforward: int = 768
    dropout: Optional[float] = None
    activation: str = "gelu"
    final_norm: bool = True
    norm_eps: float = 1e-6
    pre_norm: bool = True
    pos_encoding: str = "learnable"
    dtype: jnp.dtype = jnp.float32

    num_prefix_tokens: int = 1  # cls

    def setup(self):
        self.patch_embed = PatchEmbed(
            img_size=self.img_size,
            patch_size=self.patch_size,
            image_channels=self.image_channels,
            embed_dim=self.embed_dim,
            dtype=self.dtype,
        )
        num_tokens = self.patch_embed.num_patches + self.num_prefix_tokens
        if self.pos_encoding == "learnable":
            self.pos_embed = LearnablePosEncoding(num_tokens, self.embed_dim, self.dropout)
        else:
            self.pos_embed = IdentityPosEncoding(self.dropout)
        self.transformer = Transformer(
            num_encoder_layers=self.num_encoder_layers,
            num_heads=self.num_heads,
            embed_dim=self.embed_dim,
            dim_feedforward=self.dim_feedforward,
            dropout=self.dropout,
            activation=self.activation,
            final_norm=self.final_norm,
            norm_eps=self.norm_eps,
            pre_norm=self.pre_norm,
            dtype=self.dtype,
        )
        self.cls_token = self.param(
            "cls_token", nn.initializers.normal(stddev=0.02), (1, 1, self.embed_dim)
        )
        self.cls_head = nn.Dense(self.num_classes, dtype=self.dtype, name="cls_head")

    def prefix_tokens(self, bs: int) -> jnp.ndarray:
        return jnp.broadcast_to(self.cls_token, (bs, 1, self.embed_dim)).astype(self.dtype)

    def encode(
        self,
        img: jnp.ndarray,  # [bs, H, W, C]
        deterministic: bool = True,
        capture: Tuple[str, ...] = (),
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        seq = self.patch_embed(img)
        bs = seq.shape[0]
        seq = jnp.concatenate([self.prefix_tokens(bs), seq], axis=1)
        seq = self.pos_embed(seq, deterministic=deterministic)
        return self.transformer(seq, deterministic=deterministic, capture=capture)

    def head(self, seq: jnp.ndarray, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        return {"pred": self.cls_head(seq[:, 0])}

    def __call__(
        self,
        img: jnp.ndarray,
        deterministic: bool = True,
        capture: Tuple[str, ...] = (),
    ):
        seq, captured = self.encode(img, deterministic, capture)
        out = self.head(seq, deterministic)
        if capture:
            out["captured"] = captured
        return out

    def encode_until(
        self,
        img: jnp.ndarray,
        end_layer: int,
        deterministic: bool = True,
        capture: Tuple[str, ...] = (),
        fused_attention: bool = False,
        quant: bool = False,
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Run patchify + layers [0, end_layer) — the 'backbone' half of the
        reference's decoupled JIT export (the mid feature is the output of
        ``layers_{end_layer-1}``). ``quant`` runs the projection matmuls W8A8
        (frozen-forward inference only; ops/quant.py)."""
        seq = self.patch_embed(img)
        bs = seq.shape[0]
        seq = jnp.concatenate([self.prefix_tokens(bs), seq], axis=1)
        seq = self.pos_embed(seq, deterministic=deterministic)
        return self.transformer.run(
            seq,
            deterministic=deterministic,
            capture=capture,
            end_layer=end_layer,
            fused_attention=fused_attention,
            quant=quant,
        )

    def resume_from_layer(
        self,
        seq: jnp.ndarray,
        start_layer: int,
        deterministic: bool = True,
        fused_attention: bool = False,
        quant: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """Resume the encoder from the output of ``layers_{start_layer-1}`` and
        classify — the functional equivalent of the reference's cls_header JIT
        trace that re-enters the model with a hook substituting the mid feature
        (save_backbone_jit.py:78-90,110-114)."""
        seq, _ = self.transformer.run(
            seq,
            deterministic=deterministic,
            start_layer=start_layer,
            fused_attention=fused_attention,
            quant=quant,
        )
        return self.head(seq, deterministic)


class DeiT(ViT):
    """Adds a distillation token + head (deit.py:7-42). Note: every shipped
    reference config uses ``name: vit``; DeiT exists for API completeness."""

    num_prefix_tokens: int = 2  # cls + dist

    def setup(self):
        super().setup()
        self.dist_token = self.param(
            "dist_token", nn.initializers.normal(stddev=0.02), (1, 1, self.embed_dim)
        )
        self.dist_head = nn.Dense(self.num_classes, dtype=self.dtype, name="dist_head")

    def prefix_tokens(self, bs: int) -> jnp.ndarray:
        cls = jnp.broadcast_to(self.cls_token, (bs, 1, self.embed_dim))
        dist = jnp.broadcast_to(self.dist_token, (bs, 1, self.embed_dim))
        return jnp.concatenate([cls, dist], axis=1).astype(self.dtype)

    def head(self, seq: jnp.ndarray, deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        prob = self.cls_head(seq[:, 0])
        dist = self.dist_head(seq[:, 1])
        if deterministic:
            # eval: average both classifiers (deit.py:36-40)
            return {"pred": (prob + dist) / 2}
        return {"pred": prob, "dist": dist}


MODEL_REGISTRY: Registry = Registry("models")


def _transformer_kwargs(model_cfg: Dict[str, Any]) -> Dict[str, Any]:
    t = model_cfg["transformer"]
    p = model_cfg.get("patch_embed", {})
    pos = model_cfg.get("pos_encoding", {"name": "learnable"})
    return dict(
        img_size=p.get("img_size", 224),
        patch_size=p.get("patch_size", 16),
        image_channels=p.get("image_channels", 3),
        embed_dim=t["embed_dim"],
        num_encoder_layers=t.get("num_encoder_layers", 12),
        num_heads=t["num_heads"],
        dim_feedforward=t["dim_feedforward"],
        dropout=t.get("dropout"),
        activation=t.get("activation", "relu"),
        final_norm=t.get("final_norm", True),
        norm_eps=t.get("norm_eps", 1e-5),
        pre_norm=t.get("pre_norm", True),
        pos_encoding=pos.get("name", "learnable"),
    )


@MODEL_REGISTRY.register("vit")
def build_vit(model_cfg: Dict[str, Any], num_classes: int, dtype=jnp.float32) -> ViT:
    return ViT(num_classes=num_classes, dtype=dtype, **_transformer_kwargs(model_cfg))


@MODEL_REGISTRY.register("deit")
def build_deit(model_cfg: Dict[str, Any], num_classes: int, dtype=jnp.float32) -> DeiT:
    return DeiT(num_classes=num_classes, dtype=dtype, **_transformer_kwargs(model_cfg))


def _register_resnets():
    """'official_models' registry entry (reference models/__init__.py:18-22
    dispatches to cv_lib's torchvision zoo): flax ResNets, addressable either
    directly (name: resnet18) or via name: official_models + model_name."""
    from .resnet import RESNET_SPECS, build_resnet

    MODEL_REGISTRY.register("official_models", build_resnet)
    for _name in RESNET_SPECS:
        MODEL_REGISTRY.register(
            _name,
            lambda cfg, n, dtype=jnp.float32, _n=_name: build_resnet(
                dict(cfg, model_name=_n), n, dtype=dtype
            ),
        )


_register_resnets()


def get_model(model_cfg: Dict[str, Any], num_classes: int, dtype=jnp.float32):
    """Name-dispatch model builder (models/__init__.py:43-47)."""
    return MODEL_REGISTRY.get(model_cfg["name"])(model_cfg, num_classes, dtype=dtype)
