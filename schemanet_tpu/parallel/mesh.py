"""Device mesh + sharding rules.

The reference's entire distributed stack — mp.spawn per GPU, NCCL process
groups, DDP gradient hooks, DistributedSampler, reduce_tensor/reduce_dict
(SURVEY §2.19) — collapses into one ``jax.sharding.Mesh`` and in/out shardings
on the jitted train step. Gradient all-reduce, metric reduction and barriers
are XLA collectives inserted automatically from the sharding annotations,
riding ICI.

Axes:
* ``data``  — batch (data parallel); every config uses it.
* ``model`` — parameter sharding for the big-atlas configs: ImageNet's edge
  atlas is [1000, 500, 500] (~1 GB fp32 + Adam moments); we shard atlas
  class-axis K and the GNN code-embedding rows over ``model``. For the small
  configs ``model=1`` and everything is replicated.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# param-path regex -> PartitionSpec. Paths are '/'-joined flax param paths.
DEFAULT_PARAM_RULES = (
    # atlas: shard classes over 'model' (K is the big axis at ImageNet scale)
    (r".*schema_net/vertex_weights$", P("model")),
    (r".*schema_net/edge_weights$", P("model")),
    # GNN code embedding: shard vocabulary rows
    (r".*matcher/gnn/embedding$", P("model")),
    # backbone FFN: tensor-parallel over 'model' (hidden dim)
    (r".*mlp/linear1/kernel$", P(None, "model")),
    (r".*mlp/linear1/bias$", P("model")),
    (r".*mlp/linear2/kernel$", P("model", None)),
    # fused qkv: shard output (head) dim
    (r".*attention/linear_qkv/kernel$", P(None, "model")),
    (r".*attention/linear_qkv/bias$", P("model")),
    (r".*attention/linear_out/kernel$", P("model", None)),
)


def _spec_fits(spec: P, shape, mesh: Mesh) -> bool:
    for dim, axis in enumerate(spec):
        if axis is None:
            continue
        if dim >= len(shape) or shape[dim] % mesh.shape[axis] != 0:
            return False
    return True


def param_shardings(
    mesh: Mesh,
    params: Any,
    rules: Sequence = DEFAULT_PARAM_RULES,
) -> Any:
    """PartitionSpec pytree for a param tree; unmatched/unfittable -> replicated."""

    def spec_for(path, leaf):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        if mesh.shape.get("model", 1) > 1:
            for pattern, spec in rules:
                if re.match(pattern, name) and _spec_fits(spec, leaf.shape, mesh):
                    return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def put_global(x: Any, sharding: NamedSharding):
    """Place a host-side GLOBAL value under a (possibly multi-process)
    sharding. Single-process this is plain ``device_put``; multi-process,
    every process passes the same global value and only its addressable
    shards are materialised (``make_array_from_callback``)."""
    if jax.process_count() == 1 or sharding.is_fully_addressable:
        return jax.device_put(x, sharding)
    arr = np.asarray(x)
    return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])


def put_local_batch(x: Any, sharding: NamedSharding):
    """Assemble a global batch from per-process loader shards: each process
    passes its LOCAL slice (data/loader.py shards by process_index); the
    global batch axis is the concatenation over processes. Already-placed
    arrays (e.g. from ``device_prefetch``) pass through untouched."""
    if isinstance(x, jax.Array) and x.sharding == sharding:
        return x
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))


def shard_params(mesh: Mesh, params: Any, rules: Sequence = DEFAULT_PARAM_RULES) -> Any:
    shardings = param_shardings(mesh, params, rules)
    return jax.tree_util.tree_map(put_global, params, shardings)


def local_batch_slice(global_batch: int) -> slice:
    """Per-process slice of a host-side global batch (multi-host input sharding)."""
    per = global_batch // jax.process_count()
    start = per * jax.process_index()
    return slice(start, start + per)
