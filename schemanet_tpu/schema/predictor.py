"""SchemaNet composite predictor — the end-to-end classified pipeline.

Reference: ``schema_inference/graph/__init__.py`` (SchemaNetPredictor) +
``schema_inference/utils/ingredient_model_wrapper.py``. The reference chains
two TorchScript traces (backbone, discretization) with a CPU C++ graph build
in between — a GPU->CPU->GPU round trip per iteration (SURVEY §3.3). Here the
whole forward (frozen ViT -> VQ -> dense graph build -> GNN match) is ONE
jitted XLA program; "frozen" is ``stop_gradient`` + optimizer masking, not a
trace artifact.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..models.vit import ViT, get_model
from ..ops.vq import vq_encode
from .atlas import AtlasConfig, SchemaAtlas
from .gnn import Matcher, StaticIds


def _any_fused_backend() -> bool:
    """True when any fused Pallas kernel (attention / LN / FFN) is enabled —
    each fusion site re-checks its own backend, so this only grants
    permission for the frozen forward to fuse."""
    from ..ops.pallas.attention import attention_backend
    from ..ops.pallas.layernorm import layernorm_backend

    return attention_backend() != "xla" or layernorm_backend() != "xla"


class IngredientBackbone(nn.Module):
    """Frozen backbone + VQ producing the ingredient interface
    (ingredient_model_wrapper.py:43-69):

        cls_token [bs, P, d], feat [bs, L, d], feat_origin [bs, L, d],
        ingredients [bs, L], attn [bs, L, L], attn_cls [bs, L]

    ``attn`` is the head-mean of the *raw pre-softmax* attention at the
    extraction layer; the CLS row/patch block are split out. The codebook is a
    param of this module (named ``vocabulary`` like the reference's
    discretization embedding).
    """

    backbone: ViT
    num_codes: int
    code_dim: int
    encode_layer: int  # VQ applies to the output of layers_{encode_layer}
    extract_layer: Optional[int] = None  # raw-attention source (default: encode_layer)
    quantize: bool = True
    detach_input_seq: bool = True
    uniform_range: Tuple[float, float] = (-1.0, 1.0)
    # W8A8 PTQ of the frozen backbone's projection matmuls (ops/quant.py) —
    # forward-only by construction, which is exactly this module's contract
    # (the backbone runs under stop_gradient); 2x MXU rate on v5e
    quant_backbone: bool = False

    def setup(self):
        lo, hi = self.uniform_range
        self.vocabulary = self.param(
            "vocabulary",
            lambda key, shape: jax.random.uniform(key, shape, minval=lo, maxval=hi),
            (self.num_codes, self.code_dim),
        )

    # attention handoff dtype: the [bs, L, L] head-mean raw attention is pure
    # HBM traffic between the frozen forward and the graph build — bf16 halves
    # it when the graph path runs at training precision (set by the owning
    # SchemaNetPredictor from its atlas graph_precision; fp32 default keeps
    # golden parity for standalone use)
    attn_dtype: Any = jnp.float32

    def __call__(self, img: jnp.ndarray, quantize: Optional[bool] = None) -> Dict[str, jnp.ndarray]:
        extract = self.extract_layer if self.extract_layer is not None else self.encode_layer
        # head-mean of the pre-softmax scores is the ONLY attention statistic
        # the graph build consumes (reference ingredient_model_wrapper.py:61
        # means the hooked raw attention over heads) — capturing the mean
        # directly lets the capture layer keep the whole-layer fused kernel
        # (the attn_raw probe forced it onto the plain path) and shrinks the
        # [bs, H, n, n] capture hand-off to [bs, n, n]
        capture = (f"layers_{extract}.attn_hmean",)
        # frozen: run under stop_gradient (the reference loads no-grad traces).
        # The frozen forward takes the fused Pallas kernels on TPU backends
        # (attention scores / LN stats / FFN hidden state stay in VMEM); each
        # fusion site re-checks its own backend. The capture layer stays
        # fused too: the attn_hmean probe is emitted by the fused kernel
        # itself (ops/pallas/encoder_block.py capture_hmean).
        mid_feat, captured = self.backbone.encode_until(
            img,
            end_layer=self.encode_layer + 1,
            deterministic=True,
            capture=capture,
            fused_attention=_any_fused_backend(),
            quant=self.quant_backbone,
        )
        mid_feat = jax.lax.stop_gradient(mid_feat)
        attn_hmean = jax.lax.stop_gradient(captured[f"layers_{extract}.attn_hmean"])

        n_prefix = self.backbone.num_prefix_tokens
        # VQ the patch tokens only; prefix (CLS/dist) tokens are never
        # quantised (Adapter, discretization/visual_word_encoder.py:10-20)
        patches = mid_feat[:, n_prefix:]
        do_quantize = self.quantize if quantize is None else quantize
        q_patches, ingredients = vq_encode(
            patches, self.vocabulary, quantize=do_quantize,
            detach_input=self.detach_input_seq,
            # init may trace on a host device where Mosaic can't compile —
            # same gate as GraphConv's (campaign [VQ1] failure mode)
            backend="xla" if self.is_initializing() else "auto",
        )
        feat = jnp.concatenate([mid_feat[:, :n_prefix], q_patches], axis=1)

        # head-mean raw attention (fp32-reduced at the probe site — in-kernel
        # on the fused path), CLS row / patch block split, emitted in
        # attn_dtype (bf16 halves the hand-off under training precision)
        attn_mean = attn_hmean.astype(self.attn_dtype)  # [bs, n, n]
        return {
            "cls_token": feat[:, :n_prefix],
            "feat": q_patches,
            "feat_origin": patches,
            "ingredients": ingredients,
            "attn": attn_mean[:, n_prefix:, n_prefix:],
            "attn_cls": attn_mean[:, 0, n_prefix:],
            "mid_feat": mid_feat,
        }

    def classify_discretized(self, img: jnp.ndarray, quantize: bool = True) -> jnp.ndarray:
        """Full-model logits with the (optionally) quantised mid feature — the
        reference's backbone_discretization/cls_header JIT path, used by the
        CB agreement evaluation (evaluation.py:198-216)."""
        out = self(img, quantize=quantize)
        seq = jnp.concatenate([out["cls_token"], out["feat"]], axis=1)
        return self.backbone.resume_from_layer(
            seq,
            self.encode_layer + 1,
            fused_attention=_any_fused_backend(),
            quant=self.quant_backbone,
        )["pred"]


@dataclasses.dataclass(frozen=True)
class SchemaNetConfig:
    atlas: AtlasConfig
    gnn_embed_dim: int = 256
    gnn_num_layers: int = 2
    gnn_identity_proj: bool = False
    gnn_activation: str = "relu"
    similarity: str = "inner_product"
    # exact reference pooling denominator (batch-max live slots); see gnn.py
    ref_pooling: bool = True
    # per-sample pooling denominator (reference bs=1 semantics) — batch
    # invariant; used by serving (serve.py)
    per_sample_pooling: bool = False
    # trace-time copy of class_ingredients (static buffer): enables the
    # scatter-free class-embedding backward (schema/gnn.py StaticIds)
    static_class_ids: Optional["StaticIds"] = None
    # recompute the class-graph GNN in backward instead of saving its ~GB
    # residuals — batch-independent recompute that buys batch size at
    # ImageNet atlas scale (schema/gnn.py Matcher.remat_class_gnn)
    remat_class_gnn: bool = False
    # W8A8 PTQ of the frozen backbone (ops/quant.py); serving/eval/extraction
    quant_backbone: bool = False


class SchemaNetPredictor(nn.Module):
    """frozen ingredient backbone -> instance graphs -> atlas match -> logits.

    Param tree: ``ingredient_backbone`` (frozen), ``schema_net`` (atlas),
    ``matcher`` (GNN) — names chosen so the reference's param-group regexes
    ('schema_net', 'matcher'; worker_schema_net.py:371-375) apply unchanged.
    """

    backbone: ViT
    cfg: SchemaNetConfig
    encode_layer: int
    num_codes: int
    code_dim: int
    uniform_range: Tuple[float, float] = (-1.0, 1.0)
    dtype: Any = jnp.float32

    def setup(self):
        from ..ops.graph import graph_dtype

        self.ingredient_backbone = IngredientBackbone(
            backbone=self.backbone,
            num_codes=self.num_codes,
            code_dim=self.code_dim,
            encode_layer=self.encode_layer,
            uniform_range=self.uniform_range,
            quant_backbone=self.cfg.quant_backbone,
            attn_dtype=graph_dtype(self.cfg.atlas.graph_precision),
            name="ingredient_backbone",
        )
        self.schema_net = SchemaAtlas(self.cfg.atlas, name="schema_net")
        self.matcher = Matcher(
            similarity=self.cfg.similarity,
            num_codes=self.num_codes,
            embed_dim=self.cfg.gnn_embed_dim,
            num_layers=self.cfg.gnn_num_layers,
            identity_proj=self.cfg.gnn_identity_proj,
            activation=self.cfg.gnn_activation,
            ref_pooling=self.cfg.ref_pooling,
            per_sample_pooling=self.cfg.per_sample_pooling,
            static_class_ids=self.cfg.static_class_ids,
            remat_class_gnn=self.cfg.remat_class_gnn,
            dtype=self.dtype,
            name="matcher",
        )

    def __call__(self, img: jnp.ndarray, requires_graph: bool = False) -> Dict[str, Any]:
        output = self.ingredient_backbone(img)
        output = jax.tree_util.tree_map(jax.lax.stop_gradient, output)
        instance = self.schema_net(
            ingredients=output["ingredients"],
            attn=output["attn"],
            attn_cls=output["attn_cls"],
        )
        atlas = self.schema_net.get_atlas()
        pred = self.matcher(instance, atlas)
        ret: Dict[str, Any] = {"pred": pred}
        ret.update(atlas)
        if requires_graph:
            ret.update(instance)
            ret["ingredients"] = output["ingredients"]
            ret["attn_cls"] = output["attn_cls"]
        return ret

    def init_full(self, img: jnp.ndarray) -> Dict[str, Any]:
        """Initialisation entry point touching every parameter: the predictor
        path only traces backbone layers [0, encode_layer], so ``init`` through
        ``__call__`` would leave the tail layers (needed by the CB-agreement /
        resume path) without params. Use ``predictor.init(key, x,
        method='init_full')``."""
        ret = self(img)
        _ = self.ingredient_backbone.classify_discretized(img)
        return ret

    def build_instance_graphs(self, img: jnp.ndarray) -> Dict[str, Any]:
        """Ingredients + instance graphs without matching (init/analysis)."""
        output = self.ingredient_backbone(img)
        instance = self.schema_net(
            ingredients=output["ingredients"],
            attn=output["attn"],
            attn_cls=output["attn_cls"],
        )
        return {"output": output, "instance": instance}

    def full_vertices(self, img: jnp.ndarray) -> jnp.ndarray:
        """feat_to_full_vertices over the backbone output (init pass 1)."""
        output = self.ingredient_backbone(img)
        return self.schema_net.feat_to_full_vertices(
            output["ingredients"], output["attn_cls"]
        )

    def limited_edges(self, img: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
        """feat_to_limited_edges over the backbone output (init pass 2)."""
        output = self.ingredient_backbone(img)
        return self.schema_net.feat_to_limited_edges(
            output["ingredients"], output["attn"], labels
        )


def build_predictor(
    model_cfg: Dict[str, Any],
    schema_cfg: Dict[str, Any],
    num_classes: int,
    num_codes: int,
    code_dim: int,
    encode_layer: int,
    uniform_range: Tuple[float, float] = (-1.0, 1.0),
    dtype=jnp.float32,
    static_class_ids=None,
) -> SchemaNetPredictor:
    """Assemble from reference-style YAML blocks (worker_schema_net.py:337-364).

    ``static_class_ids``: optional host array mirroring the class_ingredients
    buffer — it is static during training, and declaring it enables the
    scatter-free class-embedding backward (schema/gnn.py StaticIds)."""
    backbone = get_model(model_cfg, num_classes, dtype=dtype)
    atlas_cfg = AtlasConfig.from_cfg(
        num_vertices=num_codes,
        num_classes=num_classes,
        ir_atlas_cfg=schema_cfg.get("ir_atlas", {}),
    )
    gnn_cfg = schema_cfg.get("gnn", {})
    cfg = SchemaNetConfig(
        atlas=atlas_cfg,
        gnn_embed_dim=gnn_cfg.get("embed_dim", 256),
        gnn_num_layers=gnn_cfg.get("num_layers", 2),
        gnn_identity_proj=gnn_cfg.get("identity_proj", False),
        gnn_activation=gnn_cfg.get("activation", "relu"),
        similarity=schema_cfg.get("matcher", {}).get("similarity", "inner_product"),
        ref_pooling=schema_cfg.get("matcher", {}).get("ref_pooling", True),
        static_class_ids=(
            StaticIds(static_class_ids) if static_class_ids is not None else None
        ),
        # YAML: schema_net.gnn.remat_class_gnn — recompute the class-GNN in
        # backward to free its ~GB residuals (worth it when HBM caps the batch)
        remat_class_gnn=gnn_cfg.get("remat_class_gnn", False),
        # YAML: schema_net.quant_backbone — W8A8 frozen-backbone forward
        quant_backbone=schema_cfg.get("quant_backbone", False),
    )
    return SchemaNetPredictor(
        backbone=backbone,
        cfg=cfg,
        encode_layer=encode_layer,
        num_codes=num_codes,
        code_dim=code_dim,
        uniform_range=uniform_range,
        dtype=dtype,
    )
