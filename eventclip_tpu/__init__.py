"""EventCLIP-TPU: a TPU-native JAX/Flax/Pallas framework for event-camera
object recognition with CLIP.

Re-implements the capabilities of the EventCLIP reference (Wuziyi616/EventCLIP)
with a TPU-first design:

- event->frame rasterization runs on-device as fused XLA/Pallas programs
  (reference: CPU numpy in DataLoader workers, datasets/vis.py)
- CLIP towers are JAX functions over explicit parameter pytrees with bf16
  compute on the MXU (reference: torch `clip` package)
- adapters / prompt tuning / LoRA are parameter-tree transforms trained with
  optax under a jit-compiled, mesh-sharded data-parallel step (reference:
  PyTorch DDP + nerv trainer)
"""

__version__ = "0.3.0"  # kept in sync with pyproject.toml

from . import ops  # noqa: F401
