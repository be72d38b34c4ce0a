from .mesh import (
    DEFAULT_PARAM_RULES,
    batch_sharding,
    local_batch_slice,
    make_mesh,
    param_shardings,
    replicated,
    shard_params,
)

__all__ = [
    "DEFAULT_PARAM_RULES",
    "batch_sharding",
    "local_batch_slice",
    "make_mesh",
    "param_shardings",
    "replicated",
    "shard_params",
]
