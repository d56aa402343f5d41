"""Shared dispatch gate for the Mosaic (Pallas) kernels.

Every Pallas kernel in this package (the fused attention in
ops/attention.py, the fused histogram in ops/rasterize.py) has an XLA
formulation next to it with identical numerics. This gate decides which
one a call site compiles:

- Non-TPU backends always take the XLA path (the kernels themselves fall
  back to interpret mode when invoked directly, e.g. from tests).
- A call site already running per-device inside shard_map (the
  tensor-parallel attention; the rasterize histogram via
  rasterize._rasterize_chw_meshed) always keeps the kernel: the
  operands it sees are local.
- Everywhere else the kernel would sit inside a jit whose operand
  shardings GSPMD propagates. A Mosaic kernel there is an opaque custom
  call the partitioner cannot split along a sharded batch axis, so it is
  only safe/fast when the process drives a single device. "Single
  device" is approximated as len(jax.devices()) == 1 — correct for this
  deployment's 1-chip hosts and for multi-process pods (1 local device
  per process), but pessimistic on a multi-chip host running a
  single-device workload; set EVENTCLIP_PALLAS=force there.

Env overrides:
- EVENTCLIP_NO_PALLAS=1        kill switch for ALL Pallas kernels
- EVENTCLIP_NO_PALLAS_RASTER=1 narrower: only the histogram kernel
  (passed by rasterize.py via extra_env)
- EVENTCLIP_PALLAS=force|off   override the single-device auto-detect
  for non-shard_map call sites (force = a multi-device host whose
  workload runs on one device; off = same effect as NO_PALLAS for
  these call sites only)
"""

import os

import jax


def pallas_ok(*, sharded: bool = False, extra_env: str = "") -> bool:
    if os.environ.get("EVENTCLIP_NO_PALLAS"):
        return False
    if extra_env and os.environ.get(extra_env):
        return False
    if jax.default_backend() != "tpu":
        return False
    if sharded:
        return True
    mode = os.environ.get("EVENTCLIP_PALLAS", "auto")
    if mode == "force":
        return True
    if mode == "off":
        return False
    return len(jax.devices()) == 1
