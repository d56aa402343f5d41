"""Multi-host initialization and host-local batch utilities.

The reference scales with single-node DDP only (SURVEY.md §2.7); the TPU
build goes further: on a multi-host slice each process calls
`initialize_distributed()` once, the mesh spans all global devices, and the
PrefetchLoader loads only this host's shard of every global batch
(`host_shard_info`). `jax.make_array_from_process_local_data` assembles the
global sharded batch; collectives ride ICI within the slice and DCN across
slices, all inserted by GSPMD.

Single-process runs are the common case and everything degrades to no-ops.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding

from .sharding import batch_pspec


def initialize_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize with env-var defaults; no-op if single."""
    if num_processes in (None, 1) and coordinator is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_shard_info() -> Tuple[int, int]:
    """(shard_index, num_shards) for the PrefetchLoader on this host."""
    return jax.process_index(), jax.process_count()


def any_process_flag(flag: bool) -> bool:
    """True on every process iff ANY process passed True.

    A deterministic collective — every process must call it at the same
    program point. The trainer uses it at epoch boundaries to agree on
    graceful-preemption exit: signal delivery skews across ranks, and a
    rank that exits alone would leave the others hanging in ZeRO-1's
    collective checkpoint fetch. Single-process: plain passthrough."""
    if jax.process_count() == 1:
        return bool(flag)
    from jax.experimental import multihost_utils

    return bool(np.asarray(multihost_utils.process_allgather(
        np.asarray([flag], dtype=np.bool_))).any())


def allreduce_max_array(x) -> np.ndarray:
    """Elementwise max of an array across every process (host-side).

    Calibration statistics (int8 activation max-abs, `ops/quant.py::
    calibrate_visual_amax`) are accumulated per host over that host's data
    shard; folding them with a cross-process max makes the quantized
    teacher/model bit-identical on every host regardless of how samples
    were sharded — required for SPMD-deterministic pseudo-labeling.
    Deterministic collective — every process must call it at the same
    program point. Single-process: passthrough (as numpy).
    """
    arr = np.asarray(x)
    if jax.process_count() == 1:
        return arr
    from jax.experimental import multihost_utils

    rows = np.asarray(multihost_utils.process_allgather(arr))
    return rows.max(axis=0)


def gather_objects(obj):
    """Every process's `obj`, as a list indexed by process id.

    A host-side allgather for small Python objects (selection dicts,
    counters): pickle, two-phase `process_allgather` (sizes, then padded
    byte rows), unpickle. Deterministic collective — every process must
    call it at the same program point. Single-process: `[obj]`.
    """
    if jax.process_count() == 1:
        return [obj]
    import pickle

    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    sizes = np.asarray(multihost_utils.process_allgather(
        np.asarray([payload.size], dtype=np.int64))).reshape(-1)
    row = np.zeros(int(sizes.max()), dtype=np.uint8)
    row[: payload.size] = payload
    rows = np.asarray(multihost_utils.process_allgather(row))
    return [
        pickle.loads(rows[i, : int(sizes[i])].tobytes())
        for i in range(len(sizes))
    ]


def make_global_batch(
    batch: Dict[str, np.ndarray], mesh: Mesh, microbatched: bool = False
) -> Dict[str, jax.Array]:
    """Host-local per-shard arrays -> global mesh-sharded arrays.

    With one process this is a plain device_put with the batch sharding;
    with many, each host contributes its slice of the global batch.
    microbatched=True is the gradient-accumulation layout ([accum, B/accum,
    ...] with dim 1 sharded, see sharding.batch_pspec); each host reshapes
    its local shard before calling, so global microbatch i is the
    concatenation of every host's i-th local microbatch — a different but
    equally valid partition of the global batch than a single-host reshape
    (the accumulated mean gradient is partition-invariant).
    """
    if jax.process_count() == 1:
        from .sharding import shard_batch

        return shard_batch(batch, mesh, microbatched=microbatched)
    sharding = NamedSharding(mesh, batch_pspec(microbatched))
    return {
        k: jax.make_array_from_process_local_data(sharding, v)
        for k, v in batch.items()
    }
