"""On-device event->frame rasterization (XLA).

Converts gathered event windows [..., N, 4 (x, y, t, p)] into uint8 polarity
histogram frames [..., H, W, 3] entirely on the accelerator. Behavioral
contract: eventclip_tpu.ops.numpy_ref (oracle for the reference semantics of
datasets/vis.py:6-117).

TPU-first design notes
----------------------
The reference scatter-adds with np.bincount on the host. Scatter-adds
serialize on TPU and sort+searchsorted is gather-bound, so the histogram is
computed **on the MXU as a one-hot matmul**: for each event e build two
one-hot rows, A[e, p_e * H + y_e] = 1 (row/polarity) and B[e, x_e] = 1
(column); then

    hist[2H, W] = A^T @ B

counts exactly the events landing on each (polarity, y, x) cell. One-hots
are bfloat16 (0/1 exact) and the matmul accumulates in float32 (counts up to
N = 20000 << 2^24, exact). Events are processed in fixed-size chunks under a
`lax.scan` so the one-hot tiles stay small (~VMEM-sized) instead of
materializing [N, 2H] in HBM; padding / out-of-bounds / zero-polarity events
simply get an all-zero A row.

Everything downstream (hot-pixel stats, normalization, colorization, white
compositing, uint8 rounding) is elementwise VPU work fused by XLA into the
same program.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas is TPU-oriented; keep CPU-only installs working
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pl = None
    pltpu = None

from .preprocess import preprocess_frames_chw
from .randaugment import randaugment


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


_EVENT_CHUNK = 2048  # one-hot tile: [2H, E] + [E, W] bf16, ~2.5 MB at 180x240
_PARTIALS_LIMIT = 1 << 29  # batch-axis strategy cap on [M*K, 2H, W] partials
_PALLAS_VMEM_BUDGET = 10 << 20  # of ~16 MB/core; leave room for pipelining


def _hist_kernel(row_ref, col_ref, out_ref):
    """One (window, event-chunk) grid step of the fused histogram.

    The event chunk arrives as a [1, 1, E/128, 128] int32 block (the 4D
    layout exists only to satisfy the (8, 128) block-shape rule; it is
    flattened back to one [1, E] lane vector here). row holds y + H for
    negative polarity, -1 for padding / out-of-bounds / zero polarity; col
    holds x. The one-hot tiles are built IN VMEM and consumed by the MXU
    in the same step, so - unlike the XLA formulation below, which
    materializes them in HBM and is bandwidth-bound - the only HBM traffic
    is the events themselves and one [2H, W] accumulator per window. Both
    one-hots are laid out contraction-on-lanes ([2H, E] and [W, E]) so the
    dot needs no relayout of either tile.
    """
    k = pl.program_id(1)
    H2, W = out_ref.shape[1], out_ref.shape[2]
    E = row_ref.shape[2] * row_ref.shape[3]
    row = row_ref[0, 0].reshape(1, E)
    col = col_ref[0, 0].reshape(1, E)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (H2, E), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (W, E), 0)
    a = (row_ids == row).astype(jnp.int8)  # [2H, E]
    bt = (col_ids == col).astype(jnp.int8)  # [W, E]
    part = jax.lax.dot_general(
        a, bt, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [2H, W]; int8 0/1 MACs in int32: exact counts at 2x bf16 MXU peak.
    # The accumulator stays int32 (the MXU's native accumulate dtype);
    # the f32 the finish stage wants comes from an external astype, which
    # XLA fuses into that stage's reductions rather than materializing a
    # second [M, 2H, W] buffer.

    @pl.when(k == 0)
    def _init():
        out_ref[0, :, :] = part

    @pl.when(k != 0)
    def _accum():
        out_ref[0, :, :] = out_ref[0, :, :] + part


def _pallas_histograms(spec: RasterSpec, windows: jnp.ndarray,
                       *, interpret: bool = False) -> jnp.ndarray:
    """[M, N, 4|3] event windows -> [M, 2, H, W] float32 count histograms.

    Same contract (and bit-exact results) as the XLA strategies below; used
    on TPU where it removes the HBM round-trip of the one-hot operands.
    """
    H, W = spec.height, spec.width
    M, N, ch = windows.shape
    x = windows[..., 0].astype(jnp.int32)
    y = windows[..., 1].astype(jnp.int32)
    p = windows[..., ch - 1]
    live = (x >= 0) & (x < W) & (y >= 0) & (y < H) & (p != 0)
    # dead events get row/col -1: they match no iota row, so the one-hot
    # column is all-zero - masking costs nothing extra in the kernel
    row = jnp.where(live, y + H * (p < 0).astype(jnp.int32), -1)
    col = jnp.where(live, x, -1)

    # bigger chunks amortize the fixed per-grid-step cost (program dispatch,
    # DMA setup) over more MXU work; the VMEM loop below still halves E when
    # the one-hot tiles would not fit, so the knob only widens small frames.
    # The [.., Es, 128] block reshape needs 128-lane alignment, so odd env
    # values are floored to it rather than crashing mid-sweep
    chunk = int(os.environ.get("EVENTCLIP_PALLAS_CHUNK", _EVENT_CHUNK))
    chunk = max(128, (chunk // 128) * 128)
    E = min(chunk, max(-(-N // 128) * 128, 128))
    while E > 128 and (2 * H + W) * E * 2 + 2 * H * W * 4 > _PALLAS_VMEM_BUDGET:
        E = max(128, (E // 2) // 128 * 128)  # keep the 128-lane alignment
    pad = (-N) % E
    if pad:
        row = jnp.pad(row, ((0, 0), (0, pad)), constant_values=-1)
        col = jnp.pad(col, ((0, 0), (0, pad)), constant_values=-1)
    K = row.shape[1] // E

    Es = E // 128
    row = row.reshape(M, K, Es, 128)
    col = col.reshape(M, K, Es, 128)

    hist = pl.pallas_call(
        _hist_kernel,
        grid=(M, K),
        in_specs=[
            pl.BlockSpec((1, 1, Es, 128), lambda m, k: (m, k, 0, 0),
                         memory_space=_vmem(interpret)),
            pl.BlockSpec((1, 1, Es, 128), lambda m, k: (m, k, 0, 0),
                         memory_space=_vmem(interpret)),
        ],
        out_specs=pl.BlockSpec((1, 2 * H, W), lambda m, k: (m, 0, 0),
                               memory_space=_vmem(interpret)),
        out_shape=jax.ShapeDtypeStruct((M, 2 * H, W), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            # windows are independent; the k revisits of one accumulator
            # block must stay sequential
            dimension_semantics=("parallel", "arbitrary"),
        ) if not interpret else None,
        interpret=interpret,
    )(row, col)
    return hist.astype(jnp.float32).reshape(M, 2, H, W)


def _vmem(interpret: bool):
    return pltpu.VMEM if not interpret else None


def _use_pallas_histograms(sharded: bool = False) -> bool:
    # Default call sites are single-device processes only (see
    # ops/pallas_gate.py): the train/eval steps run under jit with GSPMD
    # propagating batch shardings, and a Mosaic kernel there cannot be
    # partitioned along the sharded window axis. Multi-device meshes
    # reach the kernel per shard via _rasterize_chw's shard_map route
    # (sharded=True, operands local); outside it they take the XLA
    # one-hot-matmul formulation below, which GSPMD splits cleanly.
    from .pallas_gate import pallas_ok

    return pl is not None and pallas_ok(
        sharded=sharded, extra_env="EVENTCLIP_NO_PALLAS_RASTER"
    )


def _batched_histograms(spec: RasterSpec, windows: jnp.ndarray,
                        sharded: bool = False) -> jnp.ndarray:
    """[M, N, 4|3] event windows -> [M, 2, H, W] float32 count histograms.

    Accepts both window layouts: [.., 4] float32 (x, y, t, p) and the packed
    [.., 3] int16 (x, y, p) — timestamps are never read on-device, so the
    loader ships the packed form (data/host_ops.py::gather_event_windows).

    Events are split into fixed chunks that ride the *batch* axis of one big
    batched matmul (partials summed afterwards) — loop-free, so the TPU
    compile stays fast and the MXU sees a single large einsum.
    """
    if _use_pallas_histograms(sharded):
        return _pallas_histograms(spec, windows)

    H, W = spec.height, spec.width
    M, N, ch = windows.shape

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * H, 1), 1)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)

    def onehots(chunk):
        """[G, E, ch] events -> ([G, 2H, E], [G, E, W]) bf16 one-hots.

        A is built directly in contraction-on-lanes layout so the matmul
        needs no relayout of the big one-hot tile."""
        x = chunk[:, :, 0].astype(jnp.int32)
        y = chunk[:, :, 1].astype(jnp.int32)
        p = chunk[:, :, ch - 1]  # polarity is last in both layouts
        in_bounds = (x >= 0) & (x < W) & (y >= 0) & (y < H)
        live = in_bounds & (p != 0)  # p == 0 marks padding
        row = y + H * (p < 0)  # polarity selects the row block
        a = ((row[:, None, :] == row_ids) & live[:, None, :])
        b = x[:, :, None] == col_ids
        return a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)

    # memory strategy: small frames let every chunk ride the batch axis of
    # one einsum (loop-free, fastest); large frames (N-ImageNet 480x640)
    # would materialize a [M*K, 2H, W] partial tensor in the tens of GB, so
    # there the chunks are scan-accumulated into one [M, 2H, W] histogram.
    E = min(_EVENT_CHUNK, N)
    K_full = -(-N // E)
    partial_bytes = M * K_full * 2 * H * W * 4
    if partial_bytes <= _PARTIALS_LIMIT:  # 512 MB default
        pad = (-N) % E
        if pad:
            windows = jnp.pad(windows, ((0, 0), (0, pad), (0, 0)))
        K = windows.shape[1] // E
        a, b = onehots(windows.reshape(M * K, E, ch))
        hist = jnp.einsum("khe,kew->khw", a, b,
                          preferred_element_type=jnp.float32)
        return hist.reshape(M, K, 2, H, W).sum(1)

    # scan path: cap the one-hot A operand near 128 MB per step. The cap
    # takes precedence over the efficiency floor — a max(512, cap) would
    # silently blow the cap ~16x at extreme M (e.g. M=2048 N-IN windows),
    # which is exactly the geometry this path exists to protect
    E = int(min(_EVENT_CHUNK, (1 << 27) // (M * 2 * H * 2)))
    E = max(8, (E // 8) * 8)
    pad = (-N) % E
    if pad:
        windows = jnp.pad(windows, ((0, 0), (0, pad), (0, 0)))
    K = windows.shape[1] // E
    chunks = windows.reshape(M, K, E, ch).transpose(1, 0, 2, 3)  # [K,M,E,ch]

    def body(acc, chunk):
        a, b = onehots(chunk)
        part = jnp.einsum("mhe,mew->mhw", a, b,
                          preferred_element_type=jnp.float32)
        return acc + part, None

    acc0 = jnp.zeros((M, 2 * H, W), jnp.float32)
    hist, _ = jax.lax.scan(body, acc0, chunks)
    return hist.reshape(M, 2, H, W)


def _finish_frames_chw(spec: RasterSpec, hist: jnp.ndarray, cmap: jnp.ndarray) -> jnp.ndarray:
    """Hot-pixel removal + normalize + colorize + composite (batched).

    [M, 2, H, W] counts -> [M, 3, H, W] float32 in [0, 255], rounded to
    integers (the value grid of the reference's uint8 frames). Channel-first
    throughout: a trailing 2- or 3-wide channel dim would put the 128-lane
    axis at 2% utilization and force pathological narrow transposes. Written
    with explicit axis reductions rather than vmap of per-frame scalars —
    the vmapped form compiled ~30x slower on the TPU backend.
    """
    red = (1, 2, 3)
    if spec.thresh > 0:
        if spec.count_non_zero:
            nz = hist > 0
            cnt = jnp.maximum(
                nz.sum(red, keepdims=True), 1
            ).astype(jnp.float32)
            mean = hist.sum(red, keepdims=True) / cnt
            var = jnp.where(nz, (hist - mean) ** 2, 0.0).sum(
                red, keepdims=True
            ) / cnt
        else:
            mean = hist.mean(red, keepdims=True)
            var = ((hist - mean) ** 2).mean(red, keepdims=True)
        cut = spec.thresh * jnp.sqrt(var) + mean
        hist = jnp.where(hist > cut, 0.0, hist)
    peak = hist.max(red, keepdims=True)
    hist = hist / jnp.where(peak > 0, peak, 1.0)
    # elementwise colorize (a matmul over a 2-long contraction would waste
    # the MXU; this is pure f32 VPU work and fuses with the rest)
    img = (
        hist[:, 0:1] * cmap[0][None, :, None, None]
        + hist[:, 1:2] * cmap[1][None, :, None, None]
    )  # [M, 3, H, W]
    if spec.background_mask:
        alpha = jnp.clip(hist.sum(1, keepdims=True), 0.0, 1.0)
        img = img * alpha + 255.0 * (1.0 - alpha)
    return jnp.round(img)


def _rasterize_chw(spec: RasterSpec, windows: jnp.ndarray,
                   sharded: bool = False) -> jnp.ndarray:
    """[..., N, 4] -> [..., 3, H, W] float32 frames (integer-valued 0..255)."""
    lead = windows.shape[:-2]
    flat = windows.reshape((-1,) + windows.shape[-2:])
    cmap = jnp.asarray(spec.colormap())
    hists = _batched_histograms(spec, flat, sharded)  # [M, 2, H, W]
    frames = _finish_frames_chw(spec, hists, cmap)
    return frames.reshape(lead + frames.shape[-3:])


def _shardmap_raster_ok(windows: jnp.ndarray, mesh) -> bool:
    """Route the rasterizer through shard_map over the mesh data axis?

    Only worth it when the per-shard body will actually run the Mosaic
    kernel (a TPU backend with Pallas enabled) — on every other backend
    the plain GSPMD-partitioned XLA formulation is equivalent and avoids
    the extra program structure. EVENTCLIP_SHARDMAP_RASTER=force|off
    overrides (force lets CPU-mesh tests and the driver dryrun execute
    the shard_map wiring with the XLA body inside)."""
    if mesh is None or windows.ndim < 3:
        # rank 2 is a single unbatched [N, ch] window: sharding axis 0
        # would split the EVENT axis and concatenate per-shard frames
        return False
    from ..parallel.sharding import DATA_AXIS

    n_data = dict(mesh.shape).get(DATA_AXIS, 1)
    if n_data <= 1 or windows.shape[0] % n_data:
        return False
    mode = os.environ.get("EVENTCLIP_SHARDMAP_RASTER", "auto")
    if mode == "force":
        return True
    if mode == "off":
        return False
    if (os.environ.get("EVENTCLIP_NO_PALLAS")
            or os.environ.get("EVENTCLIP_NO_PALLAS_RASTER")):
        return False
    return pl is not None and jax.default_backend() == "tpu"


def _rasterize_chw_meshed(spec: RasterSpec, windows: jnp.ndarray,
                          mesh) -> jnp.ndarray:
    """_rasterize_chw, per-device via shard_map when the mesh allows it.

    A Mosaic program is an opaque custom call GSPMD cannot split along
    the sharded batch axis, so on multi-device meshes the fused Pallas
    histogram (+25% N-Caltech / +79% N-ImageNet over the XLA formulation
    on chip, BASELINE.md) is reached by shard_mapping the whole
    rasterize over the data axis: every shard runs the single-device
    kernel on its local [B/n, ...] windows — the same pattern the
    tensor-parallel attention uses (ops/attention.py). Per-sample math
    only, so no collectives and bit-identical outputs."""
    if not _shardmap_raster_ok(windows, mesh):
        return _rasterize_chw(spec, windows)
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.sharding import DATA_AXIS

    nd = windows.ndim
    return shard_map(
        lambda w: _rasterize_chw(spec, w, sharded=True),
        mesh=mesh,
        in_specs=P(DATA_AXIS, *([None] * (nd - 1))),
        out_specs=P(DATA_AXIS, *([None] * nd)),  # out gains a channel dim
        check_vma=False,
    )(windows)


def _raster_env_key() -> tuple:
    """Snapshot of every env knob the traced rasterize program depends on.

    Env reads inside a jitted function bind at TRACE time, and the trace
    cache keys only on (static args, avals) — so without this, toggling a
    knob mid-process (tests, on-chip EVENTCLIP_PALLAS_CHUNK sweeps) would
    silently reuse the previous program. The snapshot rides every public
    entry point as an extra static arg; a changed knob changes the key and
    forces a retrace. Jit-of-jit inlining reuses the inner jaxpr cache, so
    this also re-keys enclosing train/serve steps that trace fresh."""
    return (
        os.environ.get("EVENTCLIP_PALLAS_CHUNK", ""),
        os.environ.get("EVENTCLIP_SHARDMAP_RASTER", "auto"),
        os.environ.get("EVENTCLIP_NO_PALLAS", ""),
        os.environ.get("EVENTCLIP_NO_PALLAS_RASTER", ""),
        os.environ.get("EVENTCLIP_PALLAS", "auto"),
    )


@partial(jax.jit, static_argnums=(0, 2))
def _rasterize_windows_jit(spec, windows, env_key):
    frames = _rasterize_chw(spec, windows)
    return jnp.moveaxis(frames, -3, -1).astype(jnp.uint8)


def rasterize_windows(spec: RasterSpec, windows: jnp.ndarray) -> jnp.ndarray:
    """Rasterize event windows into frames (reference oracle layout).

    Args:
        spec: static rasterization parameters.
        windows: [..., N, 4 (x, y, t, p)] float32. Short / padded windows
            mark dead rows with p == 0 (they are excluded from both polarity
            channels, matching the oracle's p>0 / p<0 selection).

    Returns:
        [..., H, W, 3] uint8 frames. (For the training/eval hot path prefer
        `rasterize_for_clip`, which never materializes this HWC layout.)
    """
    return _rasterize_windows_jit(spec, windows, _raster_env_key())


@partial(jax.jit, static_argnums=(0, 1, 3), static_argnames=("mesh",))
def _rasterize_for_clip_jit(spec, pp, windows, env_key, *, mesh=None):
    frames = _rasterize_chw_meshed(spec, windows, mesh)
    return preprocess_frames_chw(pp, frames)


def rasterize_for_clip(spec: RasterSpec, pp, windows: jnp.ndarray, *,
                       mesh=None) -> jnp.ndarray:
    """Fused production path: event windows -> CLIP-normalized images.

    Equivalent to `preprocess_frames(pp, rasterize_windows(spec, windows))`
    (reference: datasets/event2img.py:120-122, frames -> PIL -> CLIP
    preprocess) but stays channel-first end to end: histogram (MXU matmul)
    -> hot-pixel/normalize/colorize/composite/uint8-round (VPU, fused) ->
    bicubic resize+crop as two weight matmuls (MXU) -> normalize. No HWC
    frame is ever materialized.

    Args:
        spec: rasterization parameters (frame geometry must match `pp`).
        pp: a `ClipPreprocess` for (spec.height, spec.width).
        windows: [..., N, 4] float32 padded event windows.
        mesh: optional jax.sharding.Mesh the enclosing step is sharded
            over; on multi-device data-parallel meshes the histogram then
            runs per shard via shard_map so the fused Pallas kernel stays
            in play (see _rasterize_chw_meshed).

    Returns:
        [..., 3, S, S] float32 CLIP-normalized images.
    """
    return _rasterize_for_clip_jit(spec, pp, windows, _raster_env_key(),
                                   mesh=mesh)


@partial(jax.jit, static_argnums=(0, 1, 4), static_argnames=("mesh",))
def _rasterize_augment_for_clip_jit(spec, pp, windows, rng, env_key, *,
                                    mesh=None):
    frames = _rasterize_chw_meshed(spec, windows, mesh)  # [B, T, 3, H, W]
    fill = 255.0 if spec.background_mask else 0.0
    if spec.grayscale:
        # grayscale colormaps emit R=G=B exactly and every RandAugment op
        # preserves channel equality, so the whole augment chain runs on one
        # channel (3x less warp/histogram work) and broadcasts after
        aug = randaugment(frames[:, :, :1], rng, 2, fill)
        frames = jnp.broadcast_to(aug, frames.shape[:2] + (3,) + aug.shape[3:])
    else:
        frames = randaugment(frames, rng, 2, fill)
    return preprocess_frames_chw(pp, frames)


def rasterize_augment_for_clip(
    spec: RasterSpec, pp, windows: jnp.ndarray, rng: jax.Array, *,
    mesh=None
) -> jnp.ndarray:
    """Training-path variant of `rasterize_for_clip` with RandAugment.

    The reference applies RandAugment to the uint8 frames before the CLIP
    transforms (datasets/event2img.py:120-127); here the augmentation runs
    on-device between the rasterizer and the resize, on [B, T, 3, H, W]
    integer-valued frames, with the white fill matching the background mode.
    Only the rasterize itself is shard_mapped under `mesh` — RandAugment
    keeps the global batch view so its rng draw semantics are unchanged.
    """
    return _rasterize_augment_for_clip_jit(spec, pp, windows, rng,
                                           _raster_env_key(), mesh=mesh)
