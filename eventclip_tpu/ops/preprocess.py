"""On-device CLIP image preprocessing.

Replicates the torchvision/PIL transform pipeline CLIP ships with (resize the
short side to `image_size` with bicubic, center-crop, scale to [0, 1],
channel-normalize) as a single jittable function over batched uint8 frames.
Reference behavior: the `preprocess` returned by `clip.load` and applied
per-view in datasets/event2img.py:122.

TPU-first design notes
----------------------
Separable resampling is expressed as two dense weight-matrix matmuls,
`frames @ M_h` over rows and `@ M_w` over columns, with the weights
precomputed on the host exactly the way PIL's `precompute_coeffs` does
(Keys bicubic a = -0.5, support 2, support scaled by the shrink factor on
downscale, edge-clamped + renormalized). Channels ride in a leading batch
dim so the image W axis (not the 3-wide channel axis) lands on the 128-lane
dimension — `jax.image.resize` on [..., H, W, 3] wastes 125/128 lanes and
measured ~75x slower than the ViT-L/14 encode itself.

Fidelity notes:
- resize target: short side -> image_size, long side -> int(size*long/short)
  (torchvision truncates, not rounds);
- PIL re-quantizes to uint8 after resizing, so we round+clip before scaling
  (PIL also clamps the intermediate pass to uint8, which we skip; agreement
  stays within a few uint8 quanta — validated in tests/test_preprocess.py);
- float32 matmuls with HIGHEST precision: resampling error must stay below
  the uint8 quantum, so no bf16 passes here.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache, partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def _keys_cubic(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    x = np.abs(x)
    return np.where(
        x < 1.0,
        ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0,
        np.where(x < 2.0, (((x - 5.0) * x + 8.0) * x - 4.0) * a, 0.0),
    )


@lru_cache(maxsize=32)
def resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[in_size, out_size] float32 PIL-bicubic resampling matrix.

    Mirrors Pillow's `precompute_coeffs`: per output pixel, taps centered at
    (i + 0.5) * in/out with support 2 (scaled by the shrink factor when
    downscaling), window clipped to the image and weights renormalized.
    """
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 2.0 * filterscale
    mat = np.zeros((in_size, out_size), dtype=np.float64)
    for i in range(out_size):
        center = (i + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size)
        taps = np.arange(xmin, xmax)
        w = _keys_cubic((taps + 0.5 - center) / filterscale)
        mat[xmin:xmax, i] = w / w.sum()
    return mat.astype(np.float32)


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


def preprocess_frames_chw(pp: ClipPreprocess, frames: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, H, W] float32 (0..255) -> [..., 3, S, S] CLIP-normalized.

    The channel-first hot path: W rides the 128-lane dim through both resize
    matmuls, no narrow transposes anywhere.
    """
    lead = frames.shape[:-3]
    H, W = pp.in_height, pp.in_width
    rh, rw = pp.resized
    s = pp.image_size
    top, left = pp.crop_origin

    # fold the crop into the resampling matrices: only the cropped rows /
    # columns of the resized image are ever produced
    mh = jnp.asarray(resize_matrix(H, rh)[:, top:top + s])  # [H, S]
    mw = jnp.asarray(resize_matrix(W, rw)[:, left:left + s])  # [W, S]

    x = frames.astype(jnp.float32).reshape((-1, 3, H, W))
    x = jnp.einsum("bchw,hy->bcyw", x, mh, precision="highest")
    x = jnp.einsum("bcyw,wz->bcyz", x, mw, precision="highest")
    # PIL stores the resized image as uint8 before ToTensor
    x = jnp.clip(jnp.round(x), 0.0, 255.0) / 255.0
    mean = jnp.asarray(CLIP_MEAN, dtype=jnp.float32)[:, None, None]
    std = jnp.asarray(CLIP_STD, dtype=jnp.float32)[:, None, None]
    x = (x - mean) / std
    return x.reshape(lead + (3, s, s))


@partial(jax.jit, static_argnums=0)
def preprocess_frames(pp: ClipPreprocess, frames: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W, 3] uint8 -> [..., 3, S, S] float32, CLIP-normalized."""
    # transpose the uint8 (1 B/px), then let the chw path cast: moving the
    # f32 would relayout 4x the bytes
    return preprocess_frames_chw(pp, jnp.moveaxis(frames, -1, -3))
