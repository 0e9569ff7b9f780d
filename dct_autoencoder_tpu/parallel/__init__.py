from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    initialize_distributed,
    make_mesh,
    pad_batch_rows,
    param_sharding,
    param_spec,
    replicated,
    shard_batch,
    shard_params,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_sharding",
    "initialize_distributed",
    "make_mesh",
    "pad_batch_rows",
    "param_sharding",
    "param_spec",
    "replicated",
    "shard_batch",
    "shard_params",
]
