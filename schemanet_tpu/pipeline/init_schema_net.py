"""Stage 3: IR-Atlas initialisation — two jitted dataset passes (reference
``scripts/init_schema_net.py``).

Pass 1 averages full-vocabulary vertex weights per class and topk-selects each
class's vertex set; pass 2 averages class-limited edges. Both are scatter-adds
by label on device; the reference's per-sample python loop over the batch
(init_schema_net.py:31-35,60-62) becomes one segment-sum.

Intentional cleanup vs the reference: its pass 2 accumulates onto the atlas's
random trunc-normal initialisation rather than zeros (init_schema_net.py:33
+= into the freshly-initialised edge_weights), leaving a residual
init/n_tracked term (~0.2% of the mean edge weight at CIFAR-100 class counts)
in the final atlas. We accumulate from zeros — the intended average. For
strict-parity comparisons, ``accumulate_compat=True`` (YAML:
``ir_atlas.init_accumulate_compat``) reproduces the reference behaviour,
seeding the accumulator with the trunc-normal init (or with an explicitly
supplied ``initial_edge_weights`` tensor, e.g. the reference's own init, for
bit-exact cross-checks).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import geometry, graph as graph_ops
from ..schema.atlas import AtlasConfig, project_atlas_params

logger = logging.getLogger(__name__)


def init_atlas(
    predictor_apply,  # (image) -> ingredient dict (ingredients, attn, attn_cls)
    loader,
    atlas_cfg: AtlasConfig,
    attr_init: Tuple[jnp.ndarray, jnp.ndarray] = None,
    accumulate_compat: bool = False,
    initial_edge_weights: jnp.ndarray = None,
    compat_seed: int = 0,
    mesh=None,
) -> Dict[str, Any]:
    """Returns {'params': atlas params, 'class_ingredients': [K, V_max]}.

    ``accumulate_compat`` reproduces the reference's pass-2 accumulation onto
    the random edge init (scripts/init_schema_net.py:19-40): the edge
    accumulator starts at ``initial_edge_weights`` (defaults to the same
    trunc-normal(0.5, 1/6) init the atlas parameter would get, drawn with
    ``compat_seed``) instead of zeros.

    With ``mesh`` both dataset passes run data-parallel over the mesh's
    ``data`` axis: batches are sharded, the class accumulators stay replicated
    (XLA turns the by-label scatter-add into a local scatter + all-reduce over
    ICI). The reference's stage 3 is single-GPU by construction
    (scripts/init_schema_net.py:106-127) despite being two full dataset
    passes."""
    c = atlas_cfg
    if mesh is not None:
        from ..parallel.mesh import batch_sharding, put_local_batch, replicated

        bsh, rep = batch_sharding(mesh), replicated(mesh)
        place_b = lambda x: put_local_batch(np.asarray(x), bsh)
        # accumulators (leading args) are donated and stay replicated
        jit_acc = lambda f, n: jax.jit(
            f, out_shardings=rep, donate_argnums=tuple(range(n))
        )
    else:
        place_b = jnp.asarray
        jit_acc = lambda f, n: jax.jit(f, donate_argnums=tuple(range(n)))
    k, v_max, m = c.num_classes, c.v_max, c.num_vertices
    if attr_init is None:
        w_v = jnp.full((2, 1), 0.5)
        w_e = jnp.full((2, 1), 0.5)
        if c.constant_vertex_attr is not None:
            w_v = jnp.asarray(c.constant_vertex_attr, jnp.float32).reshape(2, 1)
        if c.constant_edge_attr is not None:
            w_e = jnp.asarray(c.constant_edge_attr, jnp.float32).reshape(2, 1)
    else:
        w_v, w_e = attr_init

    geo = geometry.pairwise_point_sim(c.feat_h, c.feat_w, c.dist_alpha, c.dist_pow)

    # ---- pass 1: class vertex averages (init_schema_net.py:43-65) ----------
    def vertex_step(acc, counts, image, labels, valid):
        out = predictor_apply(image)
        vertices = graph_ops.feat_to_full_vertices(
            out["ingredients"], out["attn_cls"], m, w_v, c.clamp_vertex_attn
        )  # [bs, M]
        vertices = vertices * valid[:, None]
        acc = acc.at[labels].add(vertices)
        counts = counts.at[labels].add(valid)
        return acc, counts

    vertex_step = jit_acc(vertex_step, 2)
    place_r = (lambda x: jax.device_put(x, rep)) if mesh is not None else (lambda x: x)
    acc = place_r(jnp.zeros((k, m), jnp.float32))
    counts = place_r(jnp.zeros((k,), jnp.float32))
    for batch in loader:
        valid = batch.get("valid", np.ones(len(batch["label"]), np.float32))
        acc, counts = vertex_step(
            acc, counts, place_b(batch["image"]), place_b(batch["label"]), place_b(valid)
        )
    class_vertices = acc / jnp.maximum(counts, 1.0)[:, None]
    class_vertices = class_vertices / jnp.maximum(
        class_vertices.sum(axis=-1, keepdims=True), 1e-12
    )
    init_weights, valid_vertices = jax.lax.top_k(class_vertices, v_max)  # [K, V_max]
    class_ingredients = valid_vertices.astype(jnp.int32)
    logger.info("pass 1 done: %d classes, %s tracked samples", k, np.asarray(counts).sum())

    # ---- pass 2: class-limited edge averages (init_schema_net.py:19-40) ----
    def edge_step(acc_e, image, labels, valid):
        out = predictor_apply(image)
        edges = graph_ops.class_limited_edges(
            out["ingredients"], out["attn"], geo, labels, class_ingredients, w_e,
            clamp_edge_attn=c.clamp_edge_attn, remove_self_loop=c.remove_self_loop,
        )  # [bs, V_max, V_max]
        edges = edges * valid[:, None, None]
        return acc_e.at[labels].add(edges)

    if accumulate_compat:
        if initial_edge_weights is None:
            from ..schema.atlas import _trunc_normal_unit

            initial_edge_weights = _trunc_normal_unit(
                jax.random.PRNGKey(compat_seed), (k, v_max, v_max)
            )
        acc_e = jnp.asarray(initial_edge_weights, jnp.float32)
        assert acc_e.shape == (k, v_max, v_max), acc_e.shape
    else:
        acc_e = jnp.zeros((k, v_max, v_max), jnp.float32)
    edge_step = jit_acc(edge_step, 1)
    acc_e = place_r(acc_e)
    loader.set_epoch(1)
    for batch in loader:
        valid = batch.get("valid", np.ones(len(batch["label"]), np.float32))
        acc_e = edge_step(
            acc_e, place_b(batch["image"]), place_b(batch["label"]), place_b(valid)
        )
    edge_weights = acc_e / jnp.maximum(counts, 1.0)[:, None, None]
    logger.info("pass 2 done")

    params = {
        "vertex_weights": init_weights,
        "edge_weights": edge_weights,
        "vertex_attribute_weights": w_v,
        "edge_attribute_weights": w_e,
    }
    params = project_atlas_params(params, c)  # final normalize() (init:40)
    return {
        "params": jax.device_get(params),
        "class_ingredients": np.asarray(class_ingredients),
    }
