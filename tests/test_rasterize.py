"""Golden tests: TPU rasterizer vs the numpy oracle (reference semantics)."""

import numpy as np
import pytest

from eventclip_tpu.ops import (
    RasterSpec,
    event_count_windows,
    num_windows,
    rasterize_windows,
)
from eventclip_tpu.ops.numpy_ref import events_to_frames_np


def synth_events(rng, n, H, W, hot_pixels=0):
    x = rng.integers(0, W, size=n)
    y = rng.integers(0, H, size=n)
    t = np.sort(rng.uniform(0, 0.3, size=n))
    p = rng.choice([-1.0, 1.0], size=n)
    ev = np.stack([x, y, t, p], axis=1).astype(np.float32)
    # concentrate extra events on a few pixels to trigger hot-pixel removal
    for _ in range(hot_pixels):
        px, py = rng.integers(0, W), rng.integers(0, H)
        k = int(0.05 * n)
        idx = rng.integers(0, n, size=k)
        ev[idx, 0], ev[idx, 1] = px, py
    return ev


class TestWindows:
    @pytest.mark.parametrize(
        "n,N,expected",
        [
            (10, 100, [(0, 10)]),  # short stream -> single window
            (100, 100, [(0, 100)]),  # exact multiple -> tail covers last N
            (199, 100, [(0, 100), (99, 199)]),  # rem 99 > N/2 -> tail
            (150, 100, [(0, 100)]),  # rem 50, 2*50 == 100 not > -> no tail
            (151, 100, [(0, 100), (51, 151)]),  # rem 51 -> tail
            (350, 100, [(0, 100), (100, 200), (200, 300)]),  # rem 50 dropped
        ],
    )
    def test_spans(self, n, N, expected):
        assert event_count_windows(n, N) == expected
        assert num_windows(n, N) == len(expected)

    def test_matches_reference_arange_semantics(self):
        # oracle re-derivation: boundaries at arange(0, n, N), consecutive
        # pairs, plus tail [n-N, n) iff n - last_boundary > N/2
        for n in range(1, 700, 7):
            for N in (32, 100, 128):
                idx = list(range(0, n, N))
                if n < N:
                    expected = [(0, n)]
                else:
                    expected = list(zip(idx[:-1], idx[1:]))
                    if n - idx[-1] > N * 0.5:
                        expected.append((n - N, n))
                assert event_count_windows(n, N) == expected, (n, N)


def gather_windows(events, N):
    """Host-side gather: [n,4] -> [T, N, 4] with p=0 padding (short case)."""
    spans = event_count_windows(len(events), N)
    out = np.zeros((len(spans), N, 4), dtype=np.float32)
    for i, (a, b) in enumerate(spans):
        out[i, : b - a] = events[a:b]
    return out


@pytest.mark.parametrize("count_non_zero", [False, True])
@pytest.mark.parametrize("background_mask", [False, True])
@pytest.mark.parametrize("grayscale", [True, False])
def test_rasterize_matches_oracle(rng, count_non_zero, background_mask, grayscale):
    H, W, N = 60, 80, 2000
    ev = synth_events(rng, 5000, H, W, hot_pixels=3)
    spec = RasterSpec(
        height=H,
        width=W,
        window=N,
        count_non_zero=count_non_zero,
        background_mask=background_mask,
        grayscale=grayscale,
    )
    got = np.asarray(rasterize_windows(spec, gather_windows(ev, N)))
    want = events_to_frames_np(
        ev,
        N,
        (H, W),
        count_non_zero=count_non_zero,
        background_mask=background_mask,
        grayscale=grayscale,
    )
    assert got.shape == want.shape
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    # XLA may evaluate x/peak as x*rcp(peak), so values landing exactly on a
    # .5 rounding boundary can flip by 1; anything larger is a real bug.
    assert diff.max() <= 1, f"max diff {diff.max()}"
    assert (diff != 0).mean() < 5e-3, f"mismatch rate {(diff != 0).mean()}"


def test_rasterize_short_stream(rng):
    H, W, N = 40, 50, 1000
    ev = synth_events(rng, 123, H, W)
    spec = RasterSpec(height=H, width=W, window=N)
    got = np.asarray(rasterize_windows(spec, gather_windows(ev, N)))
    want = events_to_frames_np(ev, N, (H, W))
    np.testing.assert_array_equal(got, want)


def test_rasterize_zero_polarity_excluded(rng):
    H, W, N = 16, 16, 256
    ev = synth_events(rng, 256, H, W)
    ev[::3, 3] = 0.0  # zero-polarity events fall out of both channels
    spec = RasterSpec(height=H, width=W, window=N, thresh=0.0)
    got = np.asarray(rasterize_windows(spec, gather_windows(ev, N)))
    want = events_to_frames_np(ev, N, (H, W), thresh=0.0)
    np.testing.assert_array_equal(got, want)


def test_rasterize_batched_shapes(rng):
    H, W, N = 24, 32, 500
    spec = RasterSpec(height=H, width=W, window=N)
    wins = np.stack(
        [
            np.stack([gather_windows(synth_events(rng, 1000, H, W), N)[0]] * 3)
            for _ in range(4)
        ]
    )  # [4, 3, N, 4]
    frames = rasterize_windows(spec, wins)
    assert frames.shape == (4, 3, H, W, 3)
    assert frames.dtype == np.uint8


def test_fused_clip_path_matches_composition(rng):
    """rasterize_for_clip == preprocess_frames(rasterize_windows(...))."""
    from eventclip_tpu.ops import rasterize_for_clip
    from eventclip_tpu.ops.preprocess import ClipPreprocess, preprocess_frames

    H, W, N = 60, 80, 1500
    spec = RasterSpec(height=H, width=W, window=N)
    pp = ClipPreprocess(in_height=H, in_width=W, image_size=32)
    ev = synth_events(rng, 4000, H, W, hot_pixels=2)
    wins = gather_windows(ev, N)[None]  # [1, T, N, 4]
    fused = np.asarray(rasterize_for_clip(spec, pp, wins))
    composed = np.asarray(preprocess_frames(pp, rasterize_windows(spec, wins)))
    assert fused.shape == composed.shape
    np.testing.assert_allclose(fused, composed, atol=1e-5)


def test_packed_int16_windows_match_float(rng):
    """The packed [.., 3] int16 layout must rasterize identically to the
    [.., 4] float32 layout (the device never reads timestamps)."""
    spec = RasterSpec(height=24, width=32, window=200)
    ev = synth_events(rng, 650, 24, 32)
    from eventclip_tpu.data.host_ops import gather_event_windows

    f32, valid_f = gather_event_windows(ev, 200, 4, rng=None)
    i16, valid_i = gather_event_windows(ev, 200, 4, rng=None, packed=True)
    assert i16.dtype == np.int16 and i16.shape == (4, 200, 3)
    np.testing.assert_array_equal(valid_f, valid_i)
    a = np.asarray(rasterize_windows(spec, f32))
    b = np.asarray(rasterize_windows(spec, i16))
    np.testing.assert_array_equal(a, b)


def test_pallas_histograms_match_xla(rng):
    """The fused Pallas histogram kernel (TPU hot path) must be bit-exact
    vs the XLA batch-axis strategy — both window layouts, with padding,
    out-of-bounds events, and a multi-chunk (K>1) accumulation."""
    import jax.numpy as jnp

    from eventclip_tpu.data.host_ops import gather_event_windows
    from eventclip_tpu.ops import rasterize as RZ

    if RZ.pl is None:
        pytest.skip("pallas unavailable")

    spec = RasterSpec(height=20, width=24, window=300)
    ev = synth_events(rng, 1900, 20, 24)
    ev[::7, 0] = 10_000  # out-of-bounds x must be dropped identically
    for packed in (False, True):
        wins, _ = gather_event_windows(ev, 300, 6, rng=None, packed=packed)
        w = jnp.asarray(wins)
        xla = np.asarray(RZ._batched_histograms(spec, w))
        orig = RZ._EVENT_CHUNK
        RZ._EVENT_CHUNK = 128  # force K > 1 accumulation steps
        try:
            fused = np.asarray(RZ._pallas_histograms(spec, w, interpret=True))
        finally:
            RZ._EVENT_CHUNK = orig
        np.testing.assert_array_equal(xla, fused)


def test_pallas_chunk_env_knob_is_bit_exact(rng, monkeypatch):
    """EVENTCLIP_PALLAS_CHUNK resizes the kernel's event chunk (the on-chip
    sweep knob for amortizing per-grid-step overhead) without changing any
    output bit. 300-event windows under chunk=128 force K=3 accumulation
    steps; chunk=512 collapses them to K=1; misaligned values (200) and
    too-small ones (64) must clamp to the 128-lane grid, not crash."""
    import jax.numpy as jnp

    from eventclip_tpu.data.host_ops import gather_event_windows
    from eventclip_tpu.ops import rasterize as RZ

    if RZ.pl is None:
        pytest.skip("pallas unavailable")

    spec = RasterSpec(height=20, width=24, window=300)
    ev = synth_events(rng, 1900, 20, 24)
    wins, _ = gather_event_windows(ev, 300, 6, rng=None, packed=True)
    w = jnp.asarray(wins)
    xla = np.asarray(RZ._batched_histograms(spec, w))
    for chunk in ("128", "512", "200", "64"):
        monkeypatch.setenv("EVENTCLIP_PALLAS_CHUNK", chunk)
        fused = np.asarray(RZ._pallas_histograms(spec, w, interpret=True))
        np.testing.assert_array_equal(xla, fused)


def test_pallas_vmem_budget_shrinks_chunk(rng):
    """Huge frames must shrink the event chunk to fit the VMEM budget —
    and the shrink must keep E a multiple of 128. 720p with N=1900 makes
    the initial E=1920 a non-power-of-two multiple of 128, so a naive
    E //= 2 would break the [.., Es, 128] reshape (regression guard)."""
    import jax.numpy as jnp

    from eventclip_tpu.ops import rasterize as RZ

    if RZ.pl is None:
        pytest.skip("pallas unavailable")

    H, W, N = 720, 1280, 1900
    assert (2 * H + W) * 1920 * 2 + 2 * H * W * 4 > RZ._PALLAS_VMEM_BUDGET
    spec = RasterSpec(height=H, width=W, window=N)
    x = rng.integers(0, W, (1, N)); y = rng.integers(0, H, (1, N))
    p = rng.choice([-1, 1], (1, N))
    w = jnp.asarray(np.stack([x, y, p], -1).astype(np.int16))
    fused = np.asarray(RZ._pallas_histograms(spec, w, interpret=True))
    xla = np.asarray(RZ._batched_histograms(spec, w))
    np.testing.assert_array_equal(xla, fused)


def test_scan_path_matches_batched_path(rng):
    """The scan-accumulated histogram (large-frame memory strategy) must be
    exactly equal to the batch-axis strategy, for both window layouts."""
    import jax.numpy as jnp

    from eventclip_tpu.data.host_ops import gather_event_windows
    from eventclip_tpu.ops import rasterize as RZ

    spec = RasterSpec(height=20, width=24, window=300)
    ev = synth_events(rng, 1900, 20, 24)
    for packed in (False, True):
        wins, _ = gather_event_windows(ev, 300, 6, rng=None, packed=packed)
        w = jnp.asarray(wins)
        batched = np.asarray(RZ._batched_histograms(spec, w))
        orig = RZ._PARTIALS_LIMIT
        RZ._PARTIALS_LIMIT = 0  # force the scan-accumulated branch
        try:
            scanned = np.asarray(RZ._batched_histograms(spec, w))
        finally:
            RZ._PARTIALS_LIMIT = orig
        np.testing.assert_array_equal(batched, scanned)


def test_meshed_rasterize_matches_plain(rng, monkeypatch):
    """shard_map'ed rasterize (the route that keeps the Pallas histogram
    in play on multi-device meshes) is bit-identical to the plain GSPMD
    formulation, for both the inference and the RandAugment train paths
    (the augment rng stays global — only the rasterize is per-shard), and
    falls back cleanly when the leading dim does not divide the data axis
    (packed-eval buckets)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from eventclip_tpu.ops.preprocess import ClipPreprocess
    from eventclip_tpu.ops.rasterize import (
        RasterSpec,
        rasterize_augment_for_clip,
        rasterize_for_clip,
    )
    from eventclip_tpu.parallel.sharding import make_mesh

    mesh = make_mesh(n_data=4, n_model=2)
    spec = RasterSpec(height=48, width=64, window=500)
    pp = ClipPreprocess(in_height=48, in_width=64, image_size=32)
    B, T, N = 8, 2, 500
    win = np.zeros((B, T, N, 3), np.int16)
    win[..., 0] = rng.integers(0, 64, (B, T, N))
    win[..., 1] = rng.integers(0, 48, (B, T, N))
    win[..., 2] = rng.choice(np.array([-1, 1], np.int16), (B, T, N))
    dev = jax.device_put(jnp.asarray(win), NamedSharding(mesh, P("data")))

    plain = np.asarray(rasterize_for_clip(spec, pp, dev))
    monkeypatch.setenv("EVENTCLIP_SHARDMAP_RASTER", "force")
    meshed = np.asarray(rasterize_for_clip(spec, pp, dev, mesh=mesh))
    np.testing.assert_array_equal(meshed, plain)

    key = jax.random.PRNGKey(3)
    a_plain = np.asarray(rasterize_augment_for_clip(spec, pp, dev, key))
    a_meshed = np.asarray(
        rasterize_augment_for_clip(spec, pp, dev, key, mesh=mesh)
    )
    np.testing.assert_array_equal(a_meshed, a_plain)

    # 12 % 4 == 0 but exercise a genuinely indivisible lead: 6 % 4 != 0
    odd = jnp.asarray(win[:3].reshape(3 * T, N, 3))
    out = rasterize_for_clip(spec, pp, odd, mesh=mesh)
    ref = rasterize_for_clip(spec, pp, odd)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
