from .sharding import (
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    batch_pspec,
    param_pspecs,
    shard_params,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "batch_pspec",
    "param_pspecs",
    "shard_params",
    "shard_batch",
]
