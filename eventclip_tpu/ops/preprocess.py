"""On-device CLIP image preprocessing.

Replicates the torchvision/PIL transform pipeline CLIP ships with (resize the
short side to `image_size` with bicubic + antialias, center-crop, scale to
[0, 1], channel-normalize) as a single jittable function over batched uint8
frames. Reference behavior: the `preprocess` returned by `clip.load` and
applied per-view in datasets/event2img.py:122.

Fidelity notes:
- resize target: short side -> image_size, long side -> int(size*long/short)
  (torchvision truncates, not rounds);
- PIL re-quantizes to uint8 after resizing, so we round+clip before scaling;
- bicubic + antialias matches PIL's filter (Keys kernel, a = -0.5, support
  scaled on downscale). Bit-exactness with PIL's fixed-point arithmetic is
  not guaranteed; parity is validated at the feature/accuracy level.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class ClipPreprocess:
    """Static geometry of the resize+crop for one input resolution."""

    in_height: int
    in_width: int
    image_size: int = 224

    @property
    def resized(self) -> Tuple[int, int]:
        h, w, s = self.in_height, self.in_width, self.image_size
        if h <= w:
            return s, int(s * w / h)
        return int(s * h / w), s

    @property
    def crop_origin(self) -> Tuple[int, int]:
        rh, rw = self.resized
        s = self.image_size
        return int(round((rh - s) / 2.0)), int(round((rw - s) / 2.0))


@partial(jax.jit, static_argnums=0)
def preprocess_frames(pp: ClipPreprocess, frames: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W, 3] uint8 -> [..., 3, S, S] float32, CLIP-normalized."""
    lead = frames.shape[:-3]
    rh, rw = pp.resized
    s = pp.image_size
    x = frames.astype(jnp.float32)
    x = jax.image.resize(x, lead + (rh, rw, 3), method="bicubic", antialias=True)
    # PIL stores the resized image as uint8 before ToTensor
    x = jnp.clip(jnp.round(x), 0.0, 255.0)
    top, left = pp.crop_origin
    x = jax.lax.slice_in_dim(x, top, top + s, axis=len(lead))
    x = jax.lax.slice_in_dim(x, left, left + s, axis=len(lead) + 1)
    x = x / 255.0
    mean = jnp.asarray(CLIP_MEAN, dtype=jnp.float32)
    std = jnp.asarray(CLIP_STD, dtype=jnp.float32)
    x = (x - mean) / std
    return jnp.moveaxis(x, -1, -3)
