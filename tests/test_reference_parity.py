"""Bit-level parity against the ACTUAL reference implementation.

These tests import the reference's own numpy code (read-only mount at
/root/reference — numpy-only modules, no torch/nerv needed) and compare our
on-device kernels and host ops against it directly, eliminating any
our-oracle-vs-their-code drift. Skipped automatically when the reference
checkout is absent (e.g. on user machines).
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not mounted"
)


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_vis():
    return _load("ref_vis", os.path.join(REF, "datasets", "vis.py"))


@pytest.fixture(scope="module")
def ref_utils():
    return _load("ref_utils", os.path.join(REF, "datasets", "utils.py"))


def synth_events(rng, n, H, W, hot=2):
    x = rng.integers(0, W, size=n)
    y = rng.integers(0, H, size=n)
    t = np.sort(rng.uniform(0, 0.3, size=n))
    p = rng.choice([-1.0, 1.0], size=n)
    ev = np.stack([x, y, t, p], axis=1).astype(np.float32)
    for _ in range(hot):
        px, py = rng.integers(0, W), rng.integers(0, H)
        idx = rng.integers(0, n, size=int(0.05 * n))
        ev[idx, 0], ev[idx, 1] = px, py
    return ev


@pytest.mark.parametrize("count_non_zero,background_mask,grayscale", [
    (False, True, True),
    (True, False, True),
    (False, True, False),
    (False, False, False),
])
def test_numpy_oracle_matches_reference_exactly(
    ref_vis, rng, count_non_zero, background_mask, grayscale
):
    """Our numpy oracle must be bit-identical to datasets/vis.py."""
    from eventclip_tpu.ops.numpy_ref import events_to_frames_np

    H, W, N = 60, 80, 2000
    ev = synth_events(rng, 5200, H, W)
    want = ref_vis.events2frames(
        ev, split_method="event_count", convert_method="event_histogram",
        N=N, shape=(H, W), count_non_zero=count_non_zero,
        background_mask=background_mask, grayscale=grayscale,
    ).astype(np.uint8)
    got = events_to_frames_np(
        ev, N, (H, W), count_non_zero=count_non_zero,
        background_mask=background_mask, grayscale=grayscale,
    )
    np.testing.assert_array_equal(got, want)


def test_device_rasterizer_matches_reference(ref_vis, rng):
    """The TPU kernel against the reference's own code (1 quantum tol)."""
    from eventclip_tpu.ops import RasterSpec, rasterize_windows
    from eventclip_tpu.ops.windows import event_count_windows

    H, W, N = 48, 64, 1500
    ev = synth_events(rng, 4000, H, W)
    want = ref_vis.events2frames(
        ev, split_method="event_count", convert_method="event_histogram",
        N=N, shape=(H, W),
    ).astype(np.uint8)
    spans = event_count_windows(len(ev), N)
    wins = np.zeros((len(spans), N, 4), np.float32)
    for i, (a, b) in enumerate(spans):
        wins[i, : b - a] = ev[a:b]
    got = np.asarray(
        rasterize_windows(RasterSpec(height=H, width=W, window=N), wins)
    )
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1
    assert (diff != 0).mean() < 5e-3


def test_event_augments_match_reference(ref_utils, rng):
    from eventclip_tpu.data.host_ops import (
        center_events,
        hflip_events,
        tflip_events,
    )

    H, W = 60, 80
    ev = synth_events(rng, 800, H, W, hot=0)
    # center_events
    want = ref_utils.center_events(ev.copy(), resolution=(H, W))
    got = center_events(ev.copy(), resolution=(H, W))
    np.testing.assert_array_equal(got, want)
    # deterministic h-flip (p=1)
    want = ref_utils.random_flip_events_along_x(
        ev.copy(), resolution=(H, W), p=1.0
    )
    got = hflip_events(ev.copy(), resolution=(H, W), p=1.0)
    np.testing.assert_array_equal(got, want)
    # deterministic time flip
    want = ref_utils.random_time_flip_events(ev.copy(), p=1.0)
    got = tflip_events(ev.copy(), p=1.0)
    np.testing.assert_array_equal(got, want)


def test_window_split_matches_reference(ref_vis, rng):
    from eventclip_tpu.ops.windows import event_count_windows

    for n in [50, 1000, 1500, 1999, 2000, 2001, 2500, 3100]:
        ev = synth_events(rng, n, 32, 32, hot=0)
        frames = ref_vis.events2frames(
            ev, split_method="event_count",
            convert_method="event_histogram", N=1000, shape=(32, 32),
        )
        assert len(event_count_windows(n, 1000)) == frames.shape[0], n


@pytest.mark.parametrize("grayscale", [200, False])
@pytest.mark.parametrize("thresh", [0.0, 10.0])
def test_oracle_parity_extra_param_combos(ref_vis, rng, grayscale, thresh):
    """int-grayscale colormaps and disabled hot-pixel removal."""
    from eventclip_tpu.ops.numpy_ref import events_to_frames_np

    H, W, N = 40, 50, 800
    ev = synth_events(rng, 2000, H, W)
    want = ref_vis.events2frames(
        ev, split_method="event_count", convert_method="event_histogram",
        N=N, shape=(H, W), thresh=thresh, grayscale=grayscale,
    ).astype(np.uint8)
    got = events_to_frames_np(ev, N, (H, W), thresh=thresh,
                              grayscale=grayscale)
    np.testing.assert_array_equal(got, want)
