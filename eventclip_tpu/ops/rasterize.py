"""On-device event->frame rasterization (XLA).

Converts gathered event windows [..., N, 4 (x, y, t, p)] into uint8 polarity
histogram frames [..., H, W, 3] entirely on the accelerator. Behavioral
contract: eventclip_tpu.ops.numpy_ref (oracle for the reference semantics of
datasets/vis.py:6-117).

TPU-first design notes
----------------------
The reference scatter-adds with np.bincount on the host. A naive port
(jnp scatter-add) serializes on TPU, so we build the dense histogram with a
sort + vectorized binary search instead, which maps onto the VPU:

1. each event becomes an integer bin id  (y*W + x)*2 + (p < 0); padding /
   dropped / zero-polarity events get a sentinel id of 2*H*W;
2. bin ids are sorted (XLA sorting network, fully vectorized);
3. the dense [2*H*W] histogram is the first-difference of a vectorized
   binary search of all bin boundaries into the sorted ids -- no scatter,
   O(HW log N) fully-parallel work.

Everything downstream (hot-pixel stats, normalization, colorization, white
compositing, uint8 rounding) is elementwise VPU work fused by XLA into the
same program.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class RasterSpec:
    """Static parameters of the rasterizer (shapes must be compile-time)."""

    height: int
    width: int
    window: int  # N, events per frame window
    thresh: float = 10.0
    count_non_zero: bool = False
    background_mask: bool = True
    grayscale: Union[bool, int] = True

    @property
    def resolution(self) -> Tuple[int, int]:
        return (self.height, self.width)

    def colormap(self) -> np.ndarray:
        """[2, 3] float32 colors for (positive, negative) events."""
        if self.grayscale:
            v = 127 if isinstance(self.grayscale, bool) else self.grayscale
            base = np.round(np.ones(3) * v).astype(np.uint8)
            return np.stack([base, base], axis=0).astype(np.float32)
        return np.array([[255, 0, 0], [0, 0, 255]], dtype=np.float32)


def _window_histogram(spec: RasterSpec, window: jnp.ndarray) -> jnp.ndarray:
    """[N, 4] events -> [H, W, 2] float32 count histogram (one window)."""
    H, W = spec.height, spec.width
    nbins = 2 * H * W
    x = window[:, 0].astype(jnp.int32)
    y = window[:, 1].astype(jnp.int32)
    p = window[:, 3]
    in_bounds = (x >= 0) & (x < W) & (y >= 0) & (y < H)
    live = in_bounds & (p != 0)  # p == 0 marks padding (oracle: two-sided cut)
    bin_id = jnp.where(live, (y * W + x) * 2 + (p < 0), nbins)
    bin_id = jnp.sort(bin_id)
    bounds = jnp.arange(nbins + 1, dtype=bin_id.dtype)
    edges = jnp.searchsorted(bin_id, bounds, side="left")
    counts = (edges[1:] - edges[:-1]).astype(jnp.float32)
    return counts.reshape(H, W, 2)


def _finish_frame(spec: RasterSpec, hist: jnp.ndarray, cmap: jnp.ndarray) -> jnp.ndarray:
    """Hot-pixel removal + normalize + colorize + composite, [H,W,2] -> [H,W,3] u8."""
    if spec.thresh > 0:
        if spec.count_non_zero:
            nz = hist > 0
            cnt = jnp.maximum(nz.sum(), 1).astype(jnp.float32)
            mean = hist.sum() / cnt
            var = jnp.where(nz, (hist - mean) ** 2, 0.0).sum() / cnt
        else:
            mean = hist.mean()
            var = ((hist - mean) ** 2).mean()
        cut = spec.thresh * jnp.sqrt(var) + mean
        hist = jnp.where(hist > cut, 0.0, hist)
    peak = hist.max()
    hist = hist / jnp.where(peak > 0, peak, 1.0)
    # elementwise colorize (a [.,2]@[2,3] matmul would run in bf16 on the MXU
    # and lose ~2 bits; this is pure f32 VPU work and fuses with the rest)
    img = hist[..., 0:1] * cmap[0] + hist[..., 1:2] * cmap[1]  # [H, W, 3]
    if spec.background_mask:
        alpha = jnp.clip(hist.sum(-1, keepdims=True), 0.0, 1.0)
        img = img * alpha + 255.0 * (1.0 - alpha)
    return jnp.round(img).astype(jnp.uint8)


@partial(jax.jit, static_argnums=0)
def rasterize_windows(spec: RasterSpec, windows: jnp.ndarray) -> jnp.ndarray:
    """Rasterize event windows into frames.

    Args:
        spec: static rasterization parameters.
        windows: [..., N, 4 (x, y, t, p)] float32. Short / padded windows
            mark dead rows with p == 0 (they are excluded from both polarity
            channels, matching the oracle's p>0 / p<0 selection).

    Returns:
        [..., H, W, 3] uint8 frames.
    """
    lead = windows.shape[:-2]
    flat = windows.reshape((-1,) + windows.shape[-2:])
    cmap = jnp.asarray(spec.colormap())

    def one(win):
        return _finish_frame(spec, _window_histogram(spec, win), cmap)

    frames = jax.vmap(one)(flat)
    return frames.reshape(lead + frames.shape[-3:])
