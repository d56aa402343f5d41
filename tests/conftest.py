import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware (the driver separately dry-runs the real
# multi-chip path via __graft_entry__.dryrun_multichip).
# force CPU even when a TPU (axon tunnel) is attached: the suite needs an
# 8-device mesh and bit-stable f32 matmuls for the torch-oracle parity tests
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# the container's sitecustomize imports jax (registering the TPU plugin)
# before this conftest runs, so the env vars above may be snapshotted too
# late -- override through the live config as well (backends init lazily)
jax.config.update("jax_platforms", "cpu")
# cache CPU compiles across test runs (the engine/e2e tests re-compile
# identical tiny programs every session otherwise)
_cache = os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache_cpu")
try:
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except (RuntimeError, OSError):
    pass

# parity tests compare against float32 torch oracles; JAX's 'default' matmul
# precision is lower (bf16-ish passes) even on CPU
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
