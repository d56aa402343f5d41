from .distributed import (
    allreduce_max_array,
    initialize_distributed,
    host_shard_info,
    make_global_batch,
)
from .sharding import (
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    batch_pspec,
    param_pspecs,
    shard_params,
    shard_batch,
    shard_opt_state,
    zero1_pspecs,
)

__all__ = [
    "allreduce_max_array",
    "initialize_distributed",
    "host_shard_info",
    "make_global_batch",
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "batch_pspec",
    "param_pspecs",
    "shard_params",
    "shard_batch",
    "shard_opt_state",
    "zero1_pspecs",
]
