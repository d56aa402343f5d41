"""Device-mesh sharding layout for EventCLIP-TPU.

The reference's only parallelism is single-node PyTorch DDP over NCCL
(scripts/sbatch_run.sh:48-53, train.py:34-35). The TPU-native design replaces
that with a 2-D `jax.sharding.Mesh` ('data', 'model'):

- **data axis**: the batch dimension of every input tensor is sharded; the
  gradient all-reduce the reference gets from DDP/NCCL becomes an XLA `psum`
  over ICI, inserted automatically by GSPMD from the sharding annotations.
- **model axis**: Megatron-style tensor parallelism over the transformer
  weights — qkv / mlp-up projections sharded on the output feature dim,
  out / mlp-down projections sharded on the input feature dim, so each
  block needs exactly one reduce per sublayer and activations stay
  replicated at block boundaries (layer norms see full features).
  The fused qkv weight is stored [L, 3, D_out, D_in] and sharded on
  D_out, so every shard owns WHOLE heads of q, k and v (head-aligned);
  the Pallas attention kernel then runs per-shard on its local heads
  through a shard_map wrapper (ops/attention.py::tp_fused_qkv_attention)
  — activations are never gathered inside a block.

With `model=1` this degrades to pure data parallelism, which is the parity
configuration (the reference never shards the model). All collectives are
derived by GSPMD from these PartitionSpecs; there is no hand-written
communication code, per the scaling-book recipe (mesh -> annotate -> let XLA
insert collectives).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..utils.pytree import path_str as _path_str

DATA_AXIS = "data"
MODEL_AXIS = "model"

Params = Dict[str, Any]


import dataclasses


@dataclasses.dataclass(frozen=True)
class TPContext:
    """Static tensor-parallel context threaded through the towers.

    Carries the mesh + axis names the shard_map'd attention kernel needs;
    None everywhere means pure data parallelism (the parity configuration).
    """

    mesh: Mesh
    data_axis: str = DATA_AXIS
    model_axis: str = MODEL_AXIS

    @property
    def n_model(self) -> int:
        return self.mesh.shape[self.model_axis]


def make_tp_context(mesh: Mesh) -> Optional[TPContext]:
    """A TPContext when the mesh actually shards the model axis, else None."""
    if mesh.shape.get(MODEL_AXIS, 1) > 1:
        return TPContext(mesh=mesh)
    return None


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices.

    Defaults to all devices on the data axis (DDP-equivalent). The device
    grid is laid out so the model axis maps to adjacent devices (fastest ICI
    hops) and the data axis to the remaining dimension.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        assert len(devices) % n_model == 0, (len(devices), n_model)
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (n_data, n_model, len(devices))
    grid = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_pspec(microbatched: bool = False) -> P:
    """Inputs shard their leading (batch) dim over the data axis.

    microbatched=True is the gradient-accumulation layout: leaves are
    [accum, B/accum, ...] with the SECOND dim sharded (the leading dim is
    the sequential microbatch axis the train step scans over — sharding it
    would turn a sequential loop into cross-device traffic). The host
    reshapes to this layout before placement; reshaping a sharded batch
    dim inside jit would make GSPMD reshard instead.
    """
    return P(None, DATA_AXIS) if microbatched else P(DATA_AXIS)



# weight-name -> which dim (counted from the right, to be robust to the
# leading stacked-layer axis) carries the sharded feature dimension.
# Megatron layout: fused qkv + mlp-up shard the OUTPUT dim; attn-out +
# mlp-down shard the INPUT dim (weights are torch [out, in]).
# wqkv is stored [L, 3, D_out, D_in] (bqkv [L, 3, D_out]) so sharding
# D_out keeps whole q/k/v heads together on each shard (head-aligned).
_COL_SHARDED = ("wqkv", "b1", "w1", "bqkv")  # out-dim
_ROW_SHARDED = ("wo", "w2")  # in-dim ([..., out, in])


def _leaf_pspec(path: str, leaf, n_model: int) -> P:
    ndim = np.ndim(leaf)
    name = path.split("/")[-1]
    if n_model > 1 and "blocks" in path:
        if name in _COL_SHARDED:
            dims = [None] * ndim
            # biases ([L, out] / [L, 3, out]) shard dim -1;
            # weights ([L, out, in] / [L, 3, out, in]) shard dim -2
            d = -1 if name.startswith("b") else -2
            dims[d] = MODEL_AXIS
            if np.shape(leaf)[d] % n_model == 0:
                return P(*dims)
        if name in _ROW_SHARDED and ndim >= 2:
            dims = [None] * ndim
            dims[-1] = MODEL_AXIS
            if np.shape(leaf)[-1] % n_model == 0:
                return P(*dims)
    # LoRA deltas follow the same layout: a [L, r, in] replicated (r tiny),
    # b [L, out, r] replicated -- deltas are small, cheaper to replicate.
    return P()


def param_pspecs(params: Params, n_model: int = 1) -> Params:
    """PartitionSpec pytree matching `params` for a ('data','model') mesh."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _leaf_pspec(_path_str(path), leaf, n_model), params
    )


def _zero1_extend(spec: P, shape, n_data: int) -> P:
    """Extend a leaf's PartitionSpec with the data axis on its largest
    still-unsharded dim (replicated if no dim divides evenly)."""
    dims = list(spec) + [None] * (len(shape) - len(spec))
    best = None
    for i, (ax, size) in enumerate(zip(dims, shape)):
        if ax is None and size >= n_data and size % n_data == 0:
            if best is None or size > shape[best]:
                best = i
    if best is None:
        return P(*dims) if any(d is not None for d in dims) else P()
    dims[best] = DATA_AXIS
    return P(*dims)


def zero1_pspecs(opt_state, n_data: int, n_model: int = 1):
    """ZeRO-1 PartitionSpec pytree for an optimizer state.

    The reference's DDP keeps a full Adam m/v copy on every GPU; so does
    plain data parallelism here. But the moments are persistent,
    parameter-shaped, and touched only inside the ELEMENTWISE optimizer
    update — there is no reason for every data-parallel replica to hold
    all of them. Sharding each moment leaf over the data axis (the ZeRO
    stage-1 layout) cuts persistent optimizer HBM by n_data with zero
    extra collectives on the forward/backward: GSPMD slices the (already
    all-reduced) gradient locally for the update and all-gathers only the
    small per-shard parameter DELTA. Leaves the model axis already shards
    keep their Megatron layout and gain the data axis on a free dim.

    Scalars (Adam step counts, schedule state) stay replicated.
    """

    def spec(path, leaf):
        shape = np.shape(leaf)
        if len(shape) == 0:
            return P()
        base = _leaf_pspec(_path_str(path), leaf, n_model)
        return _zero1_extend(base, shape, n_data)

    return jax.tree_util.tree_map_with_path(spec, opt_state)


def shard_opt_state(opt_state, mesh: Mesh):
    """Place an optimizer state onto the mesh in the ZeRO-1 layout.

    With a 1-device mesh (or zero1 disabled upstream) optimizer state is
    simply co-located with the parameters; see zero1_pspecs for the
    multi-device layout.
    """
    if _single_device(mesh):
        return jax.device_put(opt_state)
    specs = zero1_pspecs(
        opt_state, mesh.shape[DATA_AXIS], mesh.shape[MODEL_AXIS]
    )
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        opt_state, specs,
    )


def _single_device(mesh: Mesh):
    """On a 1-device mesh every sharding is semantically a no-op, but
    COMMITTED placements (explicit device / NamedSharding) combined with
    donation cost ~30x per dispatch on remote-TPU runtimes (the relay
    re-stages committed donated buffers every call). Place uncommitted."""
    return mesh.devices.size == 1


def shard_params(params: Params, mesh: Mesh) -> Params:
    """Place a parameter tree onto the mesh with the canonical layout."""
    if _single_device(mesh):
        return jax.device_put(params)
    n_model = mesh.shape[MODEL_AXIS]
    specs = param_pspecs(params, n_model)
    return jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs
    )


def shard_batch(batch: Params, mesh: Mesh,
                microbatched: bool = False) -> Params:
    """Place a batch pytree onto the mesh, sharded over the data axis."""
    if _single_device(mesh):
        return jax.device_put(batch)
    s = NamedSharding(mesh, batch_pspec(microbatched))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)
