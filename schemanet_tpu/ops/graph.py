"""Dense, fixed-shape IR-Graph building ops — the TPU-native replacement for the
reference's four C++ CPU kernels (``cpp_extension/src/feat_to_v_attr.cpp``,
``large_scale_feat_to_v.cpp``, ``feat_to_e.cpp``, ``large_scale_feat_to_e.cpp``).

Reference semantics (executable spec preserved as comments inside the C++):

* vertex attributes of sample b = per-code (occurrence count, mean
  attention-to-CLS over that code's positions);
* edge attributes of code pair (c1, c2) = mean over *all position pairs*
  (i in positions(c1), j in positions(c2)) of (geo_sim[i, j], attn[b, i, j]).

The C++ builds ragged per-sample maps {code -> positions}; raggedness forced
the CPU round-trip (reference ``schema_net.py:214-220``). On TPU the same math
is three dense contractions:

* counts / attention sums are scatter-adds over the code axis;
* the all-pairs edge sum is ``P^T A P`` where ``P[b, l, v] = 1`` iff position
  ``l`` holds code ``v`` — an MXU matmul; the *mean* divides by the outer
  product of counts (number of position pairs).

Instance graphs (the training hot path) never have more than ``L`` distinct
codes, so instead of a ragged list we *compact* each sample to ``L`` static
slots holding its sorted distinct codes (the C++ std::map iterates codes in
ascending order, so slot order matches exactly). Padding slots carry the dummy
code id ``num_codes`` and zero weight — the very padding the reference's
matcher re-creates at ``match.py:47-54``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .normalize import normalize_max, normalize_sum, safe_softmax


def _zero_nans(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(jnp.isnan(x), jnp.zeros_like(x), x)


def graph_dtype(precision: str) -> jnp.dtype:
    """Storage dtype of graph tensors per precision mode.

    'highest' (parity/init) keeps every tensor fp32; 'default' (training,
    gated by the on-chip accuracy A/B — PERFORMANCE.md #3) emits bf16: the
    [bs, L, L] instance edges, one-hot projections, and softmaxed attention
    are pure HBM traffic on TPU, and bf16 halves every sweep while the MXU
    still accumulates contractions in fp32. Reductions (row sums) stay
    fp32-accumulated (ops/normalize.py)."""
    return jnp.bfloat16 if precision == "default" else jnp.float32


def _f32_accum_einsum(subscripts: str, *operands: jnp.ndarray, precision) -> jnp.ndarray:
    """einsum accumulating in fp32 over graph-dtype operands.

    TPU executes bf16 operands with ``preferred_element_type=f32`` natively
    (that IS the MXU accumulator); the CPU backend's DotThunk cannot
    (``BF16 x BF16 = F32`` unsupported), so operands re-widen there — the
    bf16 rounding has already happened, numerics are unchanged."""
    if operands[0].dtype != jnp.float32 and jax.default_backend() == "cpu":
        operands = tuple(o.astype(jnp.float32) for o in operands)
    return jnp.einsum(
        subscripts, *operands, precision=precision,
        preferred_element_type=jnp.float32,
    )


def clamp_softmax(attn: jnp.ndarray, clamp: Optional[float], axis: int = -1) -> jnp.ndarray:
    """Optional threshold-to--inf then softmax (schema_net.py:200-202,237-239).

    Note the reference applies the clamp whenever the config value is not
    None — ``clamp: -1.0`` in the shipped configs *does* mask raw attention
    logits below -1.0 (they exist: attn_raw is pre-softmax q.k/sqrt(d)).
    """
    if clamp is not None:
        attn = jnp.where(attn < clamp, -jnp.inf, attn)
    return safe_softmax(attn, axis=axis)


# ---------------------------------------------------------------------------
# Full-vocabulary vertex attributes (reference feat_to_v_attr.cpp:74-148)
# ---------------------------------------------------------------------------


def vertex_attributes_full(
    ingredients: jnp.ndarray,  # [bs, L] int32
    attn_cls: jnp.ndarray,  # [bs, L] float (already softmaxed by caller)
    num_vertices: int,
    mean: bool = True,
) -> jnp.ndarray:
    """Per-code (count, mean-or-sum attention) attributes, dense [bs, V, 2].

    Codes absent from a sample get (0, 0) — identical to the C++ zeros init.
    """
    bs, L = ingredients.shape
    # one-hot matmul instead of scatter-add: XLA serialises TPU scatters per
    # update (O(bs*L) sequential dynamic-update-slices) while this is one MXU
    # contraction. The one-hot is exact in bf16; accumulation is fp32.
    onehot = jax.nn.one_hot(ingredients, num_vertices, dtype=jnp.float32)  # [bs, L, V]
    count = jnp.sum(onehot, axis=1)
    attn_f = attn_cls.astype(jnp.float32)
    nan_in = jnp.isnan(attn_f)
    attn_sum = jnp.einsum(
        "blv,bl->bv", onehot, jnp.where(nan_in, 0.0, attn_f),
        precision=jax.lax.Precision.HIGHEST,
    )
    # restore torch semantics: a code whose positions carried NaN attention
    # sums to NaN (NaN * onehot-0 would otherwise poison every code)
    nan_hit = jnp.einsum("blv,bl->bv", onehot, nan_in.astype(jnp.float32)) > 0
    attn_sum = jnp.where(nan_hit, jnp.nan, attn_sum)
    if mean:
        attn_val = jnp.where(count > 0, attn_sum / jnp.maximum(count, 1.0), 0.0)
        # NaN attention sums (all -inf softmax rows) must stay NaN like torch
        attn_val = jnp.where(jnp.isnan(attn_sum), attn_sum, attn_val)
    else:
        attn_val = attn_sum
    return jnp.stack([count, attn_val], axis=-1)


def feat_to_full_vertices(
    ingredients: jnp.ndarray,  # [bs, L] int
    attn_cls: jnp.ndarray,  # [bs, L] raw (pre-softmax) CLS attention
    num_vertices: int,
    vertex_attribute_weights: jnp.ndarray,  # [2, 1]
    clamp_vertex_attn: Optional[float] = None,
) -> jnp.ndarray:
    """Blend of max-normalised (count, mean attn) attrs (schema_net.py:188-207).

    Returns [bs, V] vertex weights over the full vocabulary.
    """
    attn_cls = clamp_softmax(attn_cls, clamp_vertex_attn)
    attrs = vertex_attributes_full(ingredients, attn_cls, num_vertices)
    attrs = normalize_max(attrs, axis=1)  # per-sample, per-attribute max over V
    return jnp.einsum("bva,ao->bv", attrs, vertex_attribute_weights.astype(attrs.dtype))


# ---------------------------------------------------------------------------
# Instance graphs: slot compaction (replaces ragged std::map kernels)
# ---------------------------------------------------------------------------


class InstanceSlots(NamedTuple):
    """Per-sample compaction of up-to-L distinct codes into L static slots."""

    codes: jnp.ndarray  # [bs, L] int32: sorted distinct codes, padded with num_codes
    pos_to_slot: jnp.ndarray  # [bs, L] int32: slot index of each sequence position
    num_slots: jnp.ndarray  # [bs] int32: number of distinct codes per sample
    mask: jnp.ndarray  # [bs, L] bool: True for live slots


def compact_instance_slots(ingredients: jnp.ndarray, num_codes: int) -> InstanceSlots:
    """Sorted-unique compaction with a fixed L-slot layout.

    Matches the C++ map iteration order (ascending code id) so slot s holds the
    s-th smallest distinct code of the sample.

    NO scatters or gathers anywhere — XLA serialises TPU scatters per update,
    and dynamic gathers (``take_along_axis``) lower to a kCustom fusion that
    profiled at ~6% of the train step. Instead:

    * value-carrying ``lax.sort`` replaces argsort + gather (the sort network
      moves the payload along with the keys);
    * the inverse permutation is a second carry-sort keyed on the forward
      permutation (sorting a permutation back to iota drops the payload into
      original position order);
    * per-slot codes come from a one-hot contraction: every position of a slot
      holds the same code, so sum/count reproduces it exactly in fp32
      (code * count <= num_codes * L < 2^24).
    """
    bs, L = ingredients.shape
    iota = jnp.broadcast_to(jnp.arange(L, dtype=jnp.int32)[None, :], (bs, L))
    sorted_codes, order = jax.lax.sort(
        (ingredients.astype(jnp.int32), iota), dimension=1, is_stable=True, num_keys=1
    )
    is_new = jnp.concatenate(
        [jnp.ones((bs, 1), bool), sorted_codes[:, 1:] != sorted_codes[:, :-1]], axis=1
    )
    # slot id of each *sorted* position
    slot_of_sorted = jnp.cumsum(is_new.astype(jnp.int32), axis=1) - 1  # [bs, L]
    num_slots = slot_of_sorted[:, -1] + 1
    # carry slot ids back to original position order: `order` is a permutation,
    # so sorting by it yields iota and deposits the carried slot ids at their
    # pre-sort positions — an inverse permutation with no argsort, no gather
    _, pos_to_slot = jax.lax.sort(
        (order, slot_of_sorted), dimension=1, is_stable=True, num_keys=1
    )
    slot_ids = jnp.arange(L, dtype=jnp.int32)
    mask = slot_ids[None, :] < num_slots[:, None]
    # codes[b, s]: all positions of slot s share one code, so the one-hot mean
    # recovers it; fp32 + HIGHEST keeps the integer arithmetic exact
    proj = jax.nn.one_hot(pos_to_slot, L, dtype=jnp.float32)  # [bs, L, S]
    count = jnp.sum(proj, axis=1)  # [bs, S]
    code_sum = jnp.einsum(
        "bls,bl->bs", proj, ingredients.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    codes = jnp.where(
        mask,
        jnp.round(code_sum / jnp.maximum(count, 1.0)).astype(jnp.int32),
        num_codes,
    )
    return InstanceSlots(codes, pos_to_slot, num_slots, mask)


def instance_vertices(
    slots: InstanceSlots,
    attn_cls: jnp.ndarray,  # [bs, L] raw CLS attention
    vertex_attribute_weights: jnp.ndarray,  # [2, 1]
    clamp_vertex_attn: Optional[float] = None,
    mean: bool = True,
    precision: str = "highest",
) -> jnp.ndarray:
    """Slot-space vertex weights [bs, L] (large_scale_feat_to_v.cpp:41-143).

    Per sample: (count, mean attn) per live slot, each attribute divided by its
    max over live slots (padding carries 0 and never wins the max since the
    softmaxed attention is non-negative), then blended by W_v.

    ``precision`` follows _pair_mean_edges: 'highest' for CPU-reference
    bit-parity (golden tests, init), 'default' for the bf16 MXU training path
    (the one-hot operand is exact in bf16; only attn rounds).
    """
    bs, L = slots.pos_to_slot.shape
    dt = graph_dtype(precision)
    attn_cls = clamp_softmax(attn_cls.astype(jnp.float32), clamp_vertex_attn)
    attn_cls = _zero_nans(attn_cls)  # schema_net.py:297 .nan_to_num(0)
    # one-hot contraction instead of scatter-add (see vertex_attributes_full);
    # materialised in the graph dtype (0/1 exact in bf16, fp32 MXU accumulate)
    proj = jax.nn.one_hot(slots.pos_to_slot, L, dtype=dt)  # [bs, L, S]
    count = jnp.sum(proj, axis=1, dtype=jnp.float32)
    prec = (
        jax.lax.Precision.HIGHEST if precision == "highest" else jax.lax.Precision.DEFAULT
    )
    attn_sum = _f32_accum_einsum(
        "bls,bl->bs", proj, attn_cls.astype(dt), precision=prec,
    )
    attn_val = attn_sum / jnp.maximum(count, 1.0) if mean else attn_sum
    attrs = jnp.stack([count, attn_val], axis=-1)  # [bs, L, 2]
    attrs = normalize_max(attrs, axis=1)
    w = jnp.einsum("bsa,ao->bs", attrs, vertex_attribute_weights.astype(attrs.dtype))
    return jnp.where(slots.mask, w, 0.0).astype(dt)


def _pair_mean_edges(
    proj: jnp.ndarray,  # [bs, L, S] one-hot position->slot projection
    attn: jnp.ndarray,  # [bs, L, L] softmaxed attention
    geo_sim: jnp.ndarray,  # [L, L]
    mean: bool,
    precision: str = "highest",
) -> jnp.ndarray:
    """Core all-pairs accumulation: E[b,s1,s2,:] = agg over position pairs.

    ``P^T A P`` on the MXU; the pair count is the outer product of slot counts.
    Returns [bs, S, S, 2] with attribute 0 = geo, 1 = attn (feat_to_e.cpp:113-114).

    ``precision``: 'highest' = full fp32 passes (bit-parity with the CPU
    reference; used by the golden tests and init passes); 'default' = single
    bf16 MXU pass — the one-hot operand is exact in bf16 and the MXU
    accumulates in fp32, so only attn/geo round to bf16 (~3 significant
    digits), which is ample for training and ~4x faster.
    """
    dt = graph_dtype(precision)
    pf = proj.astype(dt)
    prec = (
        jax.lax.Precision.HIGHEST if precision == "highest" else jax.lax.Precision.DEFAULT
    )
    # operands in the graph dtype (halves the [bs, L, L] HBM reads in bf16
    # mode); MXU accumulation is fp32 either way, outputs land in dt
    attn_e = _f32_accum_einsum(
        "bls,blm,bmt->bst", pf, attn.astype(dt), pf, precision=prec,
    )
    geo_e = _f32_accum_einsum(
        "bls,lm,bmt->bst", pf, geo_sim.astype(dt), pf, precision=prec,
    )
    if mean:
        counts = jnp.sum(pf, axis=1, dtype=jnp.float32)  # [bs, S]
        pairs = counts[:, :, None] * counts[:, None, :]
        denom = jnp.maximum(pairs, 1.0)
        live = pairs > 0
        attn_e = jnp.where(live, attn_e / denom, 0.0)
        geo_e = jnp.where(live, geo_e / denom, 0.0)
    return jnp.stack([geo_e, attn_e], axis=-1).astype(dt)


def instance_edges(
    slots: InstanceSlots,
    attn: jnp.ndarray,  # [bs, L, L] raw attention
    geo_sim: jnp.ndarray,  # [L, L]
    edge_attribute_weights: jnp.ndarray,  # [2, 1]
    clamp_edge_attn: Optional[float] = None,
    mean: bool = True,
    remove_self_loop: bool = False,
    precision: str = "highest",
) -> jnp.ndarray:
    """Slot-space instance adjacency [bs, L, L] (large_scale_feat_to_e.cpp:33-150).

    Row-normalised over the second slot axis (sum -> 1), optional zero
    diagonal, then blended by W_e. Padding rows/cols are exactly zero.
    """
    bs, L = slots.pos_to_slot.shape
    dt = graph_dtype(precision)
    attn = clamp_softmax(attn.astype(jnp.float32), clamp_edge_attn)
    attn = _zero_nans(attn)
    proj = jax.nn.one_hot(slots.pos_to_slot, L, dtype=dt)  # [bs, L, S=L]
    edges = _pair_mean_edges(proj, attn, geo_sim, mean, precision)  # [bs, L, L, 2]
    edges = normalize_sum(edges, axis=2)
    if remove_self_loop:
        eye = jnp.eye(L, dtype=bool)[None, :, :, None]
        edges = jnp.where(eye, 0.0, edges)
    out = jnp.einsum("bsta,ao->bst", edges, edge_attribute_weights.astype(edges.dtype))
    live = slots.mask[:, :, None] & slots.mask[:, None, :]
    return jnp.where(live, out, 0.0).astype(dt)


# ---------------------------------------------------------------------------
# Class-limited edges for atlas initialisation (reference feat_to_e.cpp:31-127)
# ---------------------------------------------------------------------------


def class_limited_edges(
    ingredients: jnp.ndarray,  # [bs, L] int
    attn: jnp.ndarray,  # [bs, L, L] raw attention
    geo_sim: jnp.ndarray,  # [L, L]
    labels: jnp.ndarray,  # [bs] int
    class_ingredients: jnp.ndarray,  # [K, V_max] global code id per class slot
    edge_attribute_weights: jnp.ndarray,  # [2, 1]
    clamp_edge_attn: Optional[float] = None,
    mean: bool = True,
    remove_self_loop: bool = False,
    precision: str = "highest",
) -> jnp.ndarray:
    """[bs, V_max, V_max] edges restricted to each sample's class vertex set.

    The reference's per-class {code -> slot} python dict (schema_net.py:121-126)
    becomes a dense equality test between the sample's token codes and its
    label's class-ingredient row.
    """
    bs, L = ingredients.shape
    dt = graph_dtype(precision)
    attn = clamp_softmax(attn.astype(jnp.float32), clamp_edge_attn)
    my_class_codes = class_ingredients[labels]  # [bs, V_max]
    # position l maps to slot s iff its code equals the class's s-th ingredient
    proj = (ingredients[:, :, None] == my_class_codes[:, None, :]).astype(dt)
    edges = _pair_mean_edges(proj, attn, geo_sim, mean, precision)  # [bs, Vmax, Vmax, 2]
    # feat_to_limited_edges: normalize_sum_ dim=2, zero diag, blend (schema_net.py:249-254)
    edges = normalize_sum(edges, axis=2)
    if remove_self_loop:
        v = edges.shape[1]
        eye = jnp.eye(v, dtype=bool)[None, :, :, None]
        edges = jnp.where(eye, 0.0, edges)
    return jnp.einsum(
        "bsta,ao->bst", edges, edge_attribute_weights.astype(edges.dtype)
    ).astype(dt)
