"""Losses (reference ``schema_inference/loss/``).

Loss fns return ordered dicts of named scalar terms; the trainer applies
``weight_dict`` by key *prefix* and sums — the reference's contract
(worker.py:128-134). Terms not present in weight_dict (e.g. the raw
``entropy_vertex``) are logged but excluded from the total, exactly like the
reference.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax

from ..utils.registry import Registry

LOSS_REGISTRY: Registry = Registry("losses")


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), labels
    ).mean()


def entropy(p: jnp.ndarray, eps: float = 1e-7, axis: int = -1) -> jnp.ndarray:
    """-(p * log(p + eps)).sum(axis) (schema_inference_loss.py:50-57)."""
    return -jnp.sum(p * jnp.log(p + eps), axis=axis)


def rectify_linear(x: jnp.ndarray, a: float = 0.0) -> jnp.ndarray:
    """x if x > a else a - 1 + 1/(1 + a - x) — soft hinge keeping gradient
    alive below the target entropy a (schema_inference_loss.py:60-67)."""
    return jnp.where(x > a, x, a - 1.0 + 1.0 / (1.0 + a - x))


@LOSS_REGISTRY.register("ce_loss")
def make_ce_loss(**kwargs) -> Callable:
    def loss_fn(output: Dict[str, Any], target: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
        pred = output["pred"]
        if isinstance(pred, dict):
            pred = pred["pred"]
        return {"cls": cross_entropy(pred, target["label"])}

    return loss_fn


@LOSS_REGISTRY.register("schema_inference_loss")
def make_schema_inference_loss(
    re_a_vertex: float = 3.0, re_a_edge: float = 3.0, **kwargs
) -> Callable:
    """CE + rectified-entropy sparsity on the atlas (schema_inference_loss.py:10-47).

    entropy_vertex = max over classes of vertex-row entropy;
    entropy_edge   = mean over classes of (max over rows of edge-row entropy).
    """

    def loss_fn(output: Dict[str, Any], target: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
        pred = output["pred"]
        if isinstance(pred, dict):
            pred = pred["pred"]
        ret: Dict[str, jnp.ndarray] = {"cls": cross_entropy(pred, target["label"])}
        # the atlas getters may emit bf16 (graph_precision='default',
        # schema/atlas.py _out_dtype); the entropy's log/multiply chain runs
        # fp32 regardless — the upcast fuses into the elementwise chain, so
        # the [K, V, V] read stays at the storage width
        vertex_weights = output["class_vertices"].astype(jnp.float32)  # [K, V]
        edge_weights = output["class_edges"].astype(jnp.float32)  # [K, V, V]
        entropy_vertex = entropy(vertex_weights).max(axis=0)
        entropy_edge = entropy(edge_weights).max(axis=1).mean()
        ret["entropy_vertex"] = entropy_vertex
        ret["entropy_edge"] = entropy_edge
        ret["re_entropy_vertex"] = rectify_linear(entropy_vertex, a=re_a_vertex)
        ret["re_entropy_edge"] = rectify_linear(entropy_edge, a=re_a_edge)
        return ret

    return loss_fn


@LOSS_REGISTRY.register("distill_kl")
def make_distill_kl(T: float = 4.0, **kwargs) -> Callable:
    """KL distillation (base_loss.py:37-48); provided for API completeness."""

    def loss_fn(output: Dict[str, Any], target: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
        y_s = output["pred"]
        y_t = target["teacher_pred"]
        p_s = jax.nn.log_softmax(y_s / T, axis=1)
        p_t = jax.nn.softmax(y_t / T, axis=1)
        kl = jnp.sum(p_t * (jnp.log(jnp.maximum(p_t, 1e-12)) - p_s), axis=1).mean()
        return {"kl": kl * (T**2)}

    return loss_fn


def get_loss_fn(loss_cfg: Dict[str, Any], **kwargs) -> Callable:
    """loss/__init__.py:14-16 equivalent."""
    name = loss_cfg["name"]
    cfg = loss_cfg.get("loss_cfg", {}) or {}
    return LOSS_REGISTRY.get(name)(**cfg, **kwargs)


def weighted_total(
    loss_dict: Dict[str, jnp.ndarray], weight_dict: Dict[str, float]
) -> jnp.ndarray:
    """Prefix-matched weighted sum (worker.py:128-134)."""
    total = 0.0
    for k, v in loss_dict.items():
        prefix = k.split(".")[0]
        if prefix in weight_dict:
            total = total + v * weight_dict[prefix]
    return total
