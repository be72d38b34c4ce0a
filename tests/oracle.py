"""Pure-numpy oracle for the reference graph-kernel semantics.

This is a literal, loop-based transcription of the behaviour documented in the
reference C++ kernels (cpp_extension/src/feat_to_v_attr.cpp,
large_scale_feat_to_v.cpp, feat_to_e.cpp, large_scale_feat_to_e.cpp) and their
embedded python-comment specs. It is intentionally slow and dict-based — it
exists only as the golden reference for the dense TPU ops.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np


def softmax_np(x: np.ndarray, axis: int = -1) -> np.ndarray:
    m = np.max(x, axis=axis, keepdims=True)
    m = np.where(np.isfinite(m), m, 0.0)
    e = np.exp(x - m)
    with np.errstate(invalid="ignore", divide="ignore"):
        return e / np.sum(e, axis=axis, keepdims=True)


def clamp_softmax_np(x: np.ndarray, clamp: Optional[float], axis: int = -1) -> np.ndarray:
    x = np.array(x, dtype=np.float64, copy=True)
    if clamp is not None:
        x[x < clamp] = -np.inf
    return softmax_np(x, axis=axis)


def nan0(x: np.ndarray) -> np.ndarray:
    return np.where(np.isnan(x), 0.0, x)


def feat_to_v_attr_oracle(ingredients: np.ndarray, attn_cls: np.ndarray, n_vertices: int, mean: bool = True) -> np.ndarray:
    """[bs, V, 2]: (count, mean attention-to-cls) per code."""
    bs, L = ingredients.shape
    attr = np.zeros((bs, n_vertices, 2), np.float64)
    for b in range(bs):
        counts: Dict[int, int] = {}
        attns: Dict[int, List[float]] = {}
        for i in range(L):
            c = int(ingredients[b, i])
            counts[c] = counts.get(c, 0) + 1
            attns.setdefault(c, []).append(float(attn_cls[b, i]))
        for c, n in counts.items():
            attr[b, c, 0] = float(n)
            vals = attns[c]
            attr[b, c, 1] = float(np.mean(vals) if mean else np.sum(vals))
    return attr


def feat_to_full_vertices_oracle(
    ingredients: np.ndarray,
    attn_cls_raw: np.ndarray,
    n_vertices: int,
    w_v: np.ndarray,
    clamp: Optional[float] = None,
) -> np.ndarray:
    """schema_net.py:188-207 on top of the C++ kernel."""
    attn = clamp_softmax_np(attn_cls_raw, clamp)
    attrs = feat_to_v_attr_oracle(ingredients, attn, n_vertices, mean=True)
    with np.errstate(invalid="ignore", divide="ignore"):
        attrs = nan0(attrs / np.max(attrs, axis=1, keepdims=True))
    return (attrs @ np.asarray(w_v, np.float64)).squeeze(-1)


def feat_to_instance_v_oracle(
    ingredients: np.ndarray,
    attn_cls_raw: np.ndarray,
    w_v: np.ndarray,
    clamp: Optional[float] = None,
    mean: bool = True,
) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """Ragged (codes, weights) per sample; codes ascend (std::map order)."""
    attn_cls = nan0(clamp_softmax_np(attn_cls_raw, clamp))
    bs, L = ingredients.shape
    all_codes, all_weights = [], []
    for b in range(bs):
        counts: Dict[int, int] = {}
        attns: Dict[int, List[float]] = {}
        for i in range(L):
            c = int(ingredients[b, i])
            counts[c] = counts.get(c, 0) + 1
            attns.setdefault(c, []).append(float(attn_cls[b, i]))
        codes = np.array(sorted(counts), np.int64)
        attrs = np.zeros((len(codes), 2), np.float64)
        for s, c in enumerate(codes):
            attrs[s, 0] = counts[c]
            attrs[s, 1] = np.mean(attns[c]) if mean else np.sum(attns[c])
        with np.errstate(invalid="ignore", divide="ignore"):
            attrs = nan0(attrs / np.max(attrs, axis=0, keepdims=True))
        all_codes.append(codes)
        all_weights.append((attrs @ np.asarray(w_v, np.float64)).squeeze(-1))
    return all_codes, all_weights


def _edge_accumulate(
    positions: Dict[int, List[int]],
    code_to_slot: Dict[int, int],
    attn_b: np.ndarray,
    geo: np.ndarray,
    n_slots: int,
    mean: bool,
) -> np.ndarray:
    e = np.zeros((n_slots, n_slots, 2), np.float64)
    for ci, ci_pos in positions.items():
        for cj, cj_pos in positions.items():
            geo_vals, attn_vals = [], []
            for i in ci_pos:
                for j in cj_pos:
                    geo_vals.append(float(geo[i, j]))
                    attn_vals.append(float(attn_b[i, j]))
            si, sj = code_to_slot[ci], code_to_slot[cj]
            agg = np.mean if mean else np.sum
            e[si, sj, 0] = agg(geo_vals)
            e[si, sj, 1] = agg(attn_vals)
    return e


def feat_to_instance_e_oracle(
    ingredients: np.ndarray,
    attn_raw: np.ndarray,
    geo: np.ndarray,
    w_e: np.ndarray,
    clamp: Optional[float] = None,
    mean: bool = True,
    remove_self_loop: bool = False,
) -> List[np.ndarray]:
    """Ragged [n_i, n_i] blended instance adjacency per sample."""
    attn = nan0(clamp_softmax_np(attn_raw, clamp))
    bs, L = ingredients.shape
    out = []
    for b in range(bs):
        positions: Dict[int, List[int]] = {}
        for i in range(L):
            positions.setdefault(int(ingredients[b, i]), []).append(i)
        codes = sorted(positions)
        code_to_slot = {c: s for s, c in enumerate(codes)}
        e = _edge_accumulate(positions, code_to_slot, attn[b], geo, len(codes), mean)
        with np.errstate(invalid="ignore", divide="ignore"):
            e = nan0(e / e.sum(axis=1, keepdims=True))
        if remove_self_loop:
            for s in range(len(codes)):
                e[s, s, :] = 0
        out.append((e @ np.asarray(w_e, np.float64)).squeeze(-1))
    return out


def feat_to_e_oracle(
    ingredients: np.ndarray,
    attn_raw: np.ndarray,
    geo: np.ndarray,
    labels: np.ndarray,
    class_ingredients: np.ndarray,  # [K, V_max]
    w_e: np.ndarray,
    clamp: Optional[float] = None,
    mean: bool = True,
    remove_self_loop: bool = False,
) -> np.ndarray:
    """[bs, V_max, V_max] class-limited blended edges (schema_net.py:222-254)."""
    attn = clamp_softmax_np(attn_raw, clamp)
    bs, L = ingredients.shape
    n_max = class_ingredients.shape[1]
    out = np.zeros((bs, n_max, n_max), np.float64)
    for b in range(bs):
        cls_row = class_ingredients[int(labels[b])]
        code_to_slot = {int(c): s for s, c in enumerate(cls_row)}
        positions: Dict[int, List[int]] = {}
        for i in range(L):
            c = int(ingredients[b, i])
            if c in code_to_slot:
                positions.setdefault(c, []).append(i)
        e = _edge_accumulate(positions, code_to_slot, attn[b], geo, n_max, mean)
        with np.errstate(invalid="ignore", divide="ignore"):
            e = nan0(e / e.sum(axis=1, keepdims=True))
        if remove_self_loop:
            for s in range(n_max):
                e[s, s, :] = 0
        out[b] = (e @ np.asarray(w_e, np.float64)).squeeze(-1)
    return out


def pairwise_point_sim_oracle(h: int, w: int, alpha: float = 1.0, pow: float = 2.0) -> np.ndarray:
    ii, jj = np.meshgrid(np.arange(h, dtype=np.float64), np.arange(w, dtype=np.float64), indexing="ij")
    p = np.stack([ii.ravel(), jj.ravel()], axis=1)
    diff = np.abs(p[:, None] - p[None, :])
    dist = (diff**pow).sum(-1) ** (1.0 / pow)
    return 1.0 / (1.0 + dist / alpha)
