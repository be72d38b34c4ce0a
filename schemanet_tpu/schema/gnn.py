"""Graph matcher GNN (reference ``schema_inference/graph/gnn.py`` and
``match.py``).

The reference pads ragged instance graphs to the batch-max vertex count at
every step (match.py:44-54); here instance graphs arrive already dense in
static slot space (see ops/graph.py), so the GNN is one fixed-shape program.

Exact semantics preserved:
* embedding table has ``num_codes + 1`` rows; the last row is the zero-init
  padding embedding (torch padding_idx);
* GraphConv: feat <- ((E + E^T)/2 + I) @ feat, then Linear (gnn.py:20-31);
* per layer: conv -> mask-fill padding to 0 -> LayerNorm -> activation
  (gnn.py:41-46) — NOTE the LayerNorm runs *after* the mask fill, so padded
  rows become act(LN(0)) = act(beta); they are re-zeroed by the vertex-weight
  pooling, identical to the reference;
* pooling: mean over the (padded) vertex axis of feat * vertex_weights, then a
  final Linear (gnn.py:94-97).

Pooling denominator: the reference pads instance graphs to the *batch-max
ragged* vertex count and `feat.mean(dim=1)` divides by that per-batch scalar
(gnn.py:96, match.py:46). Slots beyond a sample's live count contribute 0 to
the pooled sum (vertex weights are 0 there), so the fixed-shape program
reproduces it exactly by dividing the slot-sum by the traced scalar
``max(num_slots)`` instead of the static slot count L — enabled by
``Matcher.ref_pooling`` (default True). Class graphs are fixed [K, V_max] in
the reference too, so their denominator stays the static V_max.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def symmetrize_edges(e: jnp.ndarray) -> jnp.ndarray:
    """E_sym = (E + E^T)/2 + I — the reference's GraphConv operator
    (gnn.py:20-31) materialised explicitly.

    Materialising E_sym makes each conv a SINGLE [.., n, n] x [.., n, d]
    matmul in forward and in backward (df = E_sym @ g by symmetry, a
    copy-free first-axis contraction) instead of the two E@f / E^T@f
    matmuls a not-materialised E^T costs. At ImageNet atlas scale
    ([K=1000, 500, 500] @ [K, 500, D=1024]) that removes ~2e12 MXU FLOPs
    per step from the class-GNN — its backward was 55% of the bs=1024
    step. The price is a bandwidth-bound transpose (~1 ms at 0.5 GB).

    E_sym must NOT be kept live as an autodiff residual: at atlas scale it
    is a 0.5 GB bf16 tensor and saving it pushed the bs=1024 ImageNet step
    over HBM (16.46 of 15.75 G). ``_sym_conv`` therefore folds this helper
    into a custom VJP whose residuals are the RAW edges (already live as
    the atlas param) and recomputes E_sym in backward; XLA CSEs the
    recompute across the two GNN layers.
    """
    return 0.5 * (e + jnp.swapaxes(e, -1, -2)) + jnp.eye(e.shape[-1], dtype=e.dtype)


@jax.custom_vjp
def _sym_conv(e: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """((E + E^T)/2 + I) @ f as one matmul over a recomputed E_sym."""
    return jnp.einsum("bnm,bmd->bnd", symmetrize_edges(e), f)


def _sym_conv_fwd(e, f):
    return _sym_conv(e, f), (e, f)


def _sym_conv_bwd(res, g):
    e, f = res
    # recompute E_sym (bandwidth-bound) rather than saving it (0.5 GB at
    # atlas scale); df = E_sym^T @ g = E_sym @ g by symmetry, expressed as
    # the first-axis contraction so no layout copy is emitted
    df = jnp.einsum("bnm,bnd->bmd", symmetrize_edges(e), g)
    # dE_sym = g f^T; through d(sym)/dE the identity drops out and
    # dE = (dE_sym + dE_sym^T)/2 — compute t once and symmetrise, which
    # also hands the optimizer one consistently-laid-out tensor
    t = jnp.einsum("bnd,bmd->bnm", g, f)
    de = 0.5 * (t + jnp.swapaxes(t, 1, 2))
    return de, df


_sym_conv.defvjp(_sym_conv_fwd, _sym_conv_bwd)


@jax.custom_vjp
def _sym_conv_two(e: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """The non-materialising formulation: E@f and E^T@f as two matmuls.

    2x the MXU FLOPs of ``_sym_conv`` but never writes the [.., n, n] E_sym
    tensor to HBM; faster where the conv is bandwidth-bound (small n / large
    batch). Selected by ``SCHEMANET_SYMCONV=two``."""
    fwd = jnp.einsum("bnm,bmd->bnd", e, f)
    bwd = jnp.einsum("bmn,bmd->bnd", e, f)  # E^T @ f, first-axis contraction
    return 0.5 * (fwd + bwd) + f


def _sym_conv_two_fwd(e, f):
    return _sym_conv_two(e, f), (e, f)


def _sym_conv_two_bwd(res, g):
    e, f = res
    t = jnp.einsum("bnd,bmd->bnm", g, f)
    de = 0.5 * (t + jnp.swapaxes(t, 1, 2))
    df = (
        0.5 * (jnp.einsum("bnm,bnd->bmd", e, g) + jnp.einsum("bnm,bmd->bnd", e, g))
        + g
    )
    return de, df


_sym_conv_two.defvjp(_sym_conv_two_fwd, _sym_conv_two_bwd)


def _symconv_impl():
    from ..ops.policy import resolve

    return _sym_conv_two if resolve("symconv") == "two" else _sym_conv


# one-hot-matmul embedding backward pays rows*M*D FLOPs to avoid a scatter;
# measured crossover on v5e: M=1025/D=256 (CIFAR scale, ~2.6e10) wins +3.9%
# end-to-end, M=8001/D=1024 (ImageNet scale, >=4.1e11) loses -8% vs scatter
_EMBED_ONEHOT_MAX_FLOPS = 1e11


@jax.custom_vjp
def _embed_lookup(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """``table[ids]`` whose backward is a one-hot MXU contraction (when cheap).

    Autodiff of ``jnp.take`` emits a scatter-add into the [M+1, D] table;
    XLA serialises TPU scatters (profiled at ~3% of the CIFAR-scale step).
    The gradient is exactly ``one_hot(ids)^T @ g`` — a single matmul in the
    cotangent dtype (0/1 one-hot operands are exact in bf16; accumulation is
    fp32 via preferred_element_type, matching what the scatter-add did).
    Shapes are static at trace time, so when the matmul would cost more than
    the scatter (large vocabularies — see _EMBED_ONEHOT_MAX_FLOPS) the
    backward keeps the scatter-add."""
    return jnp.take(table, ids, axis=0)


def _embed_lookup_fwd(table, ids):
    return jnp.take(table, ids, axis=0), (table.shape[0], ids)


def _embed_lookup_bwd(res, g):
    num_rows, ids = res
    rows = int(np.prod(ids.shape))
    if rows * num_rows * g.shape[-1] > _EMBED_ONEHOT_MAX_FLOPS:
        from ..ops.policy import resolve

        mode = resolve("embed_bwd")
        if mode in ("pallas", "pallas2", "interpret", "interpret2"):
            from ..ops.pallas import embed_bwd as _ek

            ilp = 2 if mode.endswith("2") else 1
            if _ek.shape_fits_kernel(rows, num_rows, g.shape[-1], ilp):
                # VMEM-accumulated histogram kernel (fp32 accumulation, same
                # serial duplicate-id semantics as the scatter-add)
                gt = _ek.embed_grad(
                    ids, g, num_rows, mode.startswith("interpret"), ilp
                )
                return gt.astype(g.dtype), np.zeros(
                    ids.shape, dtype=jax.dtypes.float0
                )
        # accumulate the scatter-add in fp32 like the one-hot branch: hot codes
        # receive thousands of duplicate-id addends per batch at ImageNet scale
        # and bf16 accumulation would systematically swamp the small ones
        gt = (
            jnp.zeros((num_rows, g.shape[-1]), jnp.float32)
            .at[ids.reshape(-1)]
            .add(g.reshape(-1, g.shape[-1]).astype(jnp.float32))
        )
        return gt.astype(g.dtype), np.zeros(ids.shape, dtype=jax.dtypes.float0)
    oh = jax.nn.one_hot(ids.reshape(-1), num_rows, dtype=g.dtype)
    # fp32 cotangents only occur in parity/golden runs — keep those exact
    # (TPU fp32 dots otherwise default to bf16 passes); bf16 training uses
    # the full-rate MXU path with fp32 accumulation
    precision = jax.lax.Precision.HIGHEST if g.dtype == jnp.float32 else None
    gt = jax.lax.dot_general(
        oh,
        g.reshape(-1, g.shape[-1]),
        (((0,), (0,)), ((), ())),
        precision=precision,
        preferred_element_type=jnp.float32,
    )
    return gt.astype(g.dtype), np.zeros(ids.shape, dtype=jax.dtypes.float0)


_embed_lookup.defvjp(_embed_lookup_fwd, _embed_lookup_bwd)


class StaticIds:
    """Hashable host copy of a never-updated integer id buffer.

    The class-graph ``class_ingredients`` buffer ([K, V_max] global code ids)
    is written once by atlas init and never mutated during training, yet it
    rides through the jitted step as a traced array — so autodiff of the
    class-graph embedding gather pays a DYNAMIC scatter-add (profiled at
    ~22 ms for the 500k-row ImageNet atlas, PERFORMANCE.md §10; the round-2
    sorted-segment kernel attempt hit parity only because the on-device
    argsort of the ids was itself 15 ms). Carrying the ids as a static host
    array moves that argsort to the Python trace (free at runtime) and turns
    the backward into a static-permutation gather + banded reduction.

    Hashable/comparable by value so it is safe as a flax module attribute
    (frozen-dataclass equality) and as a ``custom_vjp`` nondiff argument.
    """

    def __init__(self, ids):
        self.ids = np.ascontiguousarray(np.asarray(ids, dtype=np.int32))
        self.ids.setflags(write=False)
        self._key = (self.ids.shape, self.ids.tobytes())

    def __eq__(self, other):
        return isinstance(other, StaticIds) and self._key == other._key

    def __hash__(self):
        return hash(self._key)

    def __repr__(self):
        return f"StaticIds(shape={self.ids.shape})"


def _static_segment_sum(sorted_ids: np.ndarray, g_perm: jnp.ndarray, num_rows: int):
    """sum rows of ``g_perm`` (already in sorted-id order) per id — all
    segment boundaries are static.

    Two implementations, selected by the policy's ``static_embed_bwd`` field
    (ops/policy.py; env override SCHEMANET_STATIC_EMBED_BWD):

    * ``blocked`` (default): chunk the sorted rows; each chunk's ids span a
      contiguous code band [lo, lo+W) (W = static max band width over chunks),
      so the chunk reduces with ONE one-hot MXU matmul [C, W]^T @ [C, D] and
      accumulates into the output at a static offset. FLOPs R*W*D*2 with
      W ~ C/avg_occurrence — two orders below the full one-hot contraction,
      no scatter anywhere.
    * ``sorted_scatter``: the plain fp32 scatter-add but with
      ``indices_are_sorted`` (the permutation already applied by a static
      gather) — the fallback for comparison runs.
    """
    from ..ops.policy import resolve

    R, D = g_perm.shape
    mode = resolve("static_embed_bwd")
    if mode == "sorted_scatter":
        return (
            jnp.zeros((num_rows, D), jnp.float32)
            .at[jnp.asarray(sorted_ids)]
            .add(g_perm.astype(jnp.float32), indices_are_sorted=True)
        )
    C = min(8192, R)
    n_chunks = -(-R // C)
    pad = n_chunks * C - R
    if pad:
        # pad ids with the last (largest) id and rows with zeros: the padding
        # lands inside the final band and contributes nothing to its sum
        sorted_ids = np.concatenate([sorted_ids, np.full(pad, sorted_ids[-1], np.int32)])
        g_perm = jnp.concatenate([g_perm, jnp.zeros((pad, D), g_perm.dtype)], axis=0)
    chunks = sorted_ids.reshape(n_chunks, C)
    lows = chunks[:, 0].astype(np.int64)
    widths = chunks[:, -1] - chunks[:, 0] + 1
    W = int(min(num_rows, -(-int(widths.max()) // 128) * 128))
    # fp32 cotangents only occur in parity/golden runs — keep those exact,
    # like _embed_lookup_bwd's one-hot branch
    precision = jax.lax.Precision.HIGHEST if g_perm.dtype == jnp.float32 else None
    out = jnp.zeros((num_rows, D), jnp.float32)
    for i in range(n_chunks):
        lo = int(min(lows[i], num_rows - W))
        local = jnp.asarray(chunks[i] - lo)
        oh = jax.nn.one_hot(local, W, dtype=g_perm.dtype)
        part = jax.lax.dot_general(
            oh,
            jax.lax.dynamic_slice_in_dim(g_perm, i * C, C, axis=0),
            (((0,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32,
        )
        out = jax.lax.dynamic_update_slice(
            out, jax.lax.dynamic_slice(out, (lo, 0), (W, D)) + part, (lo, 0)
        )
    return out


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(1,))
def _embed_lookup_static(table: jnp.ndarray, sids: StaticIds) -> jnp.ndarray:
    """``table[sids.ids]`` for ids known at trace time (class graphs).

    Forward is the same gather; the backward replaces the dynamic scatter-add
    with a host-argsorted static permutation + banded one-hot reduction
    (see StaticIds / _static_segment_sum)."""
    return jnp.take(table, jnp.asarray(sids.ids), axis=0)


def _embed_lookup_static_fwd(table, sids):
    return _embed_lookup_static(table, sids), table.shape[0]


def _embed_lookup_static_bwd(sids, num_rows, g):
    ids = sids.ids.reshape(-1)
    D = g.shape[-1]
    g2 = g.reshape(ids.size, D)
    perm = np.argsort(ids, kind="stable")
    g_perm = jnp.take(g2, jnp.asarray(perm), axis=0)
    gt = _static_segment_sum(ids[perm], g_perm, num_rows)
    return (gt.astype(g.dtype),)


_embed_lookup_static.defvjp(_embed_lookup_static_fwd, _embed_lookup_static_bwd)


class GraphConv(nn.Module):
    """feat <- ((E + E^T)/2 + I) @ feat, then Linear (reference gnn.py:20-31).

    Computed via ``_sym_conv``: one matmul over a materialised-then-freed
    E_sym in forward, recomputed in backward (see symmetrize_edges for the
    FLOP/memory accounting). Expressing the backward's E_sym^T@g as a
    first-axis contraction avoids full-tensor layout copies (420 MB at
    atlas scale).
    """

    out_dim: int
    identity_proj: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, edges: jnp.ndarray, feat: jnp.ndarray) -> jnp.ndarray:
        # edges: [bs, n, n] raw, feat: [bs, n, dim]
        from ..ops.pallas.graphconv import (
            graphconv_backend,
            shape_fits_kernel,
            sym_conv,
        )

        backend = graphconv_backend()
        if (
            backend in ("pallas", "interpret")
            and not self.is_initializing()  # init may trace on a host device
            and shape_fits_kernel(
                edges.shape[-1], feat.shape[-1], feat.dtype.itemsize
            )
        ):
            # opt-in fused kernel: E_sym/t never round-trip HBM (see
            # ops/pallas/graphconv.py); numerics match _sym_conv. The shape
            # gate keeps small instance graphs (per-program overhead-bound)
            # and VMEM-overflowing giants on the batched XLA dot.
            feat = sym_conv(edges.astype(feat.dtype), feat, backend == "interpret")
        else:
            feat = _symconv_impl()(edges.astype(feat.dtype), feat)
        if self.identity_proj:
            return feat
        return nn.Dense(
            self.out_dim,
            dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.normal(stddev=1.0),  # ref: init.normal_(bias)
            name="linear",
        )(feat)


class GNNLayer(nn.Module):
    embed_dim: int
    activation: str = "relu"
    identity_proj: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        edges: jnp.ndarray,
        feat: jnp.ndarray,
        feat_mask: Optional[jnp.ndarray] = None,  # [bs, n] True = padding
    ) -> jnp.ndarray:
        from ..models.layers import get_activation

        feat = GraphConv(self.embed_dim, self.identity_proj, self.dtype, name="g_conv")(
            edges, feat
        )
        if feat_mask is not None:
            feat = jnp.where(feat_mask[..., None], 0.0, feat)
        norm = nn.LayerNorm(dtype=self.dtype, name="norm")
        # LN -> act is a pure bandwidth tail (at ImageNet atlas scale the
        # class-graph feat is [1000, 500, 1024] ~ 1 GB bf16 per tensor, twice
        # per GNN layer in fwd + bwd): fuse both into one Pallas pass when the
        # platform supports it (same backend gate as the backbone's LN,
        # ops/pallas/layernorm.py). Params stay owned by nn.LayerNorm (same
        # ckpt tree); differentiable via the kernel's custom VJP.
        if not self.is_initializing():
            from ..ops.pallas.layernorm import fused_layernorm
            from ..ops.policy import resolve

            # the policy's gnn_ln field gates just this site (A/B the GNN
            # tail independently of the backbone LN). Tuned default is the
            # XLA path: the round-3 chip A/B measured the fused kernel LOSING
            # here at both scales (ImageNet bs=1024 step 486 -> 404 ms, CIFAR
            # 101.8 -> 97.7 ms with backend=xla) — the [K*V, D] row-flattened
            # launch is grid-overhead-bound while XLA fuses LN+relu into the
            # conv's epilogue. See ops/policy.py.
            backend = resolve("gnn_ln")
            if backend in ("pallas", "interpret"):
                _ = norm(feat[:1, :1])  # materialise params only (DCE'd)
                p = norm.variables["params"]
                fused_act = "relu" if self.activation == "relu" else "none"
                out = fused_layernorm(
                    feat, p["scale"], p["bias"], 1e-6,
                    interpret=backend == "interpret", act=fused_act,
                )
                if fused_act == "none":
                    out = get_activation(self.activation)(out)
                return out
        feat = norm(feat)
        return get_activation(self.activation)(feat)


class GNN(nn.Module):
    """Shared graph embedder for instance graphs and the class atlas."""

    num_codes: int
    embed_dim: int
    num_layers: int
    identity_proj: bool = False
    activation: str = "relu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        nodes: jnp.ndarray,  # [bs, n] vertex weights
        edges: jnp.ndarray,  # [bs, n, n]
        ingredients: jnp.ndarray,  # [bs, n] int code ids (num_codes = padding)
        feat_mask: Optional[jnp.ndarray] = None,
        pool_size: Optional[jnp.ndarray] = None,  # traced scalar denominator
        static_ingredients: Optional[StaticIds] = None,  # trace-time copy of ids
    ) -> jnp.ndarray:
        def embed_init(key, shape, dtype=jnp.float32):
            # trunc_normal on real codes, zeros on the padding row (gnn.py:63-76)
            table = jax.nn.initializers.truncated_normal(stddev=1.0, lower=-2.0, upper=2.0)(
                key, shape, dtype
            )
            return table.at[self.num_codes].set(0.0)

        table = self.param("embedding", embed_init, (self.num_codes + 1, self.embed_dim))
        # cast the table (not the gathered rows) so the backward contraction
        # runs in the compute dtype; in fp32 parity mode this is a no-op
        if static_ingredients is not None:
            assert static_ingredients.ids.shape == tuple(ingredients.shape), (
                static_ingredients.ids.shape, ingredients.shape)
            feat = _embed_lookup_static(table.astype(self.dtype), static_ingredients)
        else:
            feat = _embed_lookup(table.astype(self.dtype), ingredients)
        for i in range(self.num_layers):
            feat = GNNLayer(
                self.embed_dim,
                self.activation,
                self.identity_proj,
                self.dtype,
                name=f"layers_{i}",
            )(edges, feat, feat_mask)
        feat = feat * nodes[..., None].astype(feat.dtype)
        # mean over the padded vertex axis; with pool_size given, divide by the
        # ragged size like the reference (gnn.py:96) — padded slots contribute
        # 0 to the sum, so this is exact. pool_size may be a scalar (batch-max,
        # training parity) or [bs] (per-sample, serving bs=1 semantics).
        if pool_size is None:
            denom = jnp.asarray(feat.shape[1], feat.dtype)
        else:
            denom = pool_size.astype(feat.dtype)
        feat = feat.sum(axis=1) / (denom[..., None] if denom.ndim else denom)
        feat = nn.Dense(
            self.embed_dim,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(stddev=1.0),  # ref: init.normal_(fc.weight)
            bias_init=nn.initializers.zeros,
            name="fc",
        )(feat)
        return feat


def similarity_fn(name: str):
    """match.py:14-31 similarity registry."""

    def cosine(a, b):
        num = jnp.sum(a * b, axis=-1)
        den = jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1)
        sim = num / jnp.maximum(den, 1e-12)
        return (sim + 1) / 2

    def euclidean(a, b):
        return 1.0 / (1.0 + jnp.linalg.norm(a - b, axis=-1))

    def inner_product(a, b):
        return jnp.sum(a * b, axis=-1)

    return {"cosine": cosine, "euclidean": euclidean, "inner_product": inner_product}[name]


class Matcher(nn.Module):
    """Embeds instance graphs and the K class graphs with one shared GNN;
    logits[b, k] = similarity(instance_b, class_k) (match.py:33-76)."""

    similarity: str
    num_codes: int
    embed_dim: int
    num_layers: int
    identity_proj: bool = False
    activation: str = "relu"
    # divide instance pooling by the batch-max live slot count (exact reference
    # semantics, match.py:46 + gnn.py:96) instead of the static slot count
    ref_pooling: bool = True
    # divide by each sample's OWN live slot count instead of the batch max —
    # the reference's bs=1 semantics (batch-max == own count), which makes the
    # logits batch-invariant for serving. Only meaningful with ref_pooling.
    per_sample_pooling: bool = False
    # trace-time copy of the class_ingredients buffer (it is written once by
    # atlas init and never updated): enables the static embedding backward
    # (no dynamic scatter — see StaticIds). MUST match the buffer's value;
    # the worker asserts this on checkpoint resume.
    static_class_ids: Optional[StaticIds] = None
    # rematerialise the class-graph GNN in backward (save nothing but its
    # inputs). The class-GNN residuals are batch-INdependent but huge at
    # ImageNet atlas scale (~1 GB bf16 per [K, V, D] feat, ~5 GB under the
    # trainer's `dots` policy) — recomputing them (+~3 TFLOP, also
    # batch-independent) frees the HBM that caps the batch size, letting a
    # larger batch amortise the ~146 ms batch-independent step share.
    remat_class_gnn: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.gnn = GNN(
            num_codes=self.num_codes,
            embed_dim=self.embed_dim,
            num_layers=self.num_layers,
            identity_proj=self.identity_proj,
            activation=self.activation,
            dtype=self.dtype,
        )

    def __call__(self, instance: dict, atlas: dict) -> jnp.ndarray:
        pool_size = None
        if self.ref_pooling and instance.get("num_slots") is not None:
            if self.per_sample_pooling:
                pool_size = jnp.maximum(instance["num_slots"], 1)  # [bs]
            else:
                pool_size = jnp.maximum(jnp.max(instance["num_slots"]), 1)
        feat_instance = self.gnn(
            nodes=instance["instance_vertices"],
            edges=instance["instance_edges"],
            ingredients=instance["instance_ingredients"],
            feat_mask=instance.get("feat_mask"),
            pool_size=pool_size,
        )  # [bs, dim]
        if self.remat_class_gnn and not self.is_initializing():
            # nn.remat reuses self.gnn's scope, so params stay shared with the
            # instance path (value/grad exactness pinned by test_remat_class_gnn).
            # static_class_ids is closed over, not passed: StaticIds is a
            # trace-time static, not a jax type checkpoint could thread.
            def _class_gnn(mdl, nodes, edges, ingredients):
                return mdl(
                    nodes=nodes,
                    edges=edges,
                    ingredients=ingredients,
                    static_ingredients=self.static_class_ids,
                )

            feat_kg = nn.remat(_class_gnn)(
                self.gnn,
                atlas["class_vertices"],
                atlas["class_edges"],
                atlas["class_ingredients"],
            )  # [K, dim]
        else:
            feat_kg = self.gnn(
                nodes=atlas["class_vertices"],
                edges=atlas["class_edges"],
                ingredients=atlas["class_ingredients"],
                static_ingredients=self.static_class_ids,
            )  # [K, dim]
        sim = similarity_fn(self.similarity)
        return sim(feat_instance[:, None, :], feat_kg[None, :, :])  # [bs, K]
