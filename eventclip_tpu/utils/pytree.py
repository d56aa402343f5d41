"""Shared pytree-path helpers.

One canonical '/'-joined key per tree leaf — the naming contract shared by
checkpoint archives (engine/checkpoint.py), partition masks
(models/partition.py), optimizer labels (engine/optim.py), and sharding
specs (parallel/sharding.py). Keep it in one place: a naming drift between
any two of those silently breaks checkpoint loading or sharding.
"""

from __future__ import annotations


def path_str(path) -> str:
    """jax.tree_util key path -> 'a/b/0/c' string."""
    return "/".join(
        str(getattr(p, "key", getattr(p, "idx", p))) for p in path
    )
