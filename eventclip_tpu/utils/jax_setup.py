"""Common JAX runtime setup for the CLIs."""

from __future__ import annotations

import os


def setup_jax(cache_dir: str | None = None) -> None:
    """Enable the persistent compilation cache (remote-TPU compiles in this
    environment take 30-500 s per program; the cache amortizes them across
    invocations). Respects an existing JAX_COMPILATION_CACHE_DIR."""
    import jax

    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    cache_dir = cache_dir or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache",
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except (RuntimeError, OSError):
        pass  # read-only checkout or backends already finalized
