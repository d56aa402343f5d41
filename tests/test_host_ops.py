"""Host-side event op tests (behavioral contracts from datasets/utils.py)."""

import numpy as np

from eventclip_tpu.data import (
    center_events,
    gather_event_windows,
    hflip_events,
    shift_events,
    tflip_events,
)
from eventclip_tpu.data.host_ops import max_views


def make_events(rng, n, H=180, W=240):
    ev = np.stack(
        [
            rng.integers(0, W, n),
            rng.integers(0, H, n),
            np.sort(rng.uniform(0.05, 0.3, n)),
            rng.choice([-1.0, 1.0], n),
        ],
        axis=1,
    ).astype(np.float32)
    return ev


def test_center_events(rng):
    ev = make_events(rng, 500, H=180, W=240)
    # squeeze events into a corner so centering has work to do
    ev[:, 0] = ev[:, 0] % 60
    ev[:, 1] = ev[:, 1] % 40
    out = center_events(ev.copy(), (180, 240))
    assert out[:, 2].min() == 0
    x_min, x_max = out[:, 0].min(), out[:, 0].max()
    y_min, y_max = out[:, 1].min(), out[:, 1].max()
    # bbox center lands at the frame center (within integer-shift resolution)
    assert abs((x_max + x_min + 1) / 2 - 240 / 2) <= 0.5
    assert abs((y_max + y_min + 1) / 2 - 180 / 2) <= 0.5


def test_shift_drops_out_of_bounds(rng):
    ev = make_events(rng, 1000, H=100, W=120)
    out = shift_events(ev.copy(), max_shift=10, resolution=(100, 120), rng=rng)
    assert len(out) <= len(ev)
    assert (out[:, 0] >= 0).all() and (out[:, 0] < 120).all()
    assert (out[:, 1] >= 0).all() and (out[:, 1] < 100).all()


def test_hflip_involution(rng):
    ev = make_events(rng, 100)
    out = hflip_events(hflip_events(ev.copy(), (180, 240), p=1.0), (180, 240), p=1.0)
    np.testing.assert_array_equal(out, ev)


def test_tflip_semantics(rng):
    ev = make_events(rng, 100)
    out = tflip_events(ev.copy(), p=1.0)
    # order reversed, time zero-based at what was the last event
    np.testing.assert_allclose(out[0, 2], 0.0)
    np.testing.assert_allclose(out[:, 3], -ev[::-1, 3])
    np.testing.assert_allclose(out[:, 0], ev[::-1, 0])
    # double flip restores x/y/p and relative time deltas
    out2 = tflip_events(out.copy(), p=1.0)
    np.testing.assert_allclose(out2[:, [0, 1, 3]], ev[:, [0, 1, 3]])
    np.testing.assert_allclose(
        np.diff(out2[:, 2]), np.diff(ev[:, 2]), rtol=1e-5, atol=1e-6
    )


def test_max_views():
    # N-Caltech train: 225000/20000 ~ 11 -> clamp 2; val -> clamp 10
    assert max_views(225000, 20000, 2) == 2
    assert max_views(225000, 20000, 10) == 10
    # N-Cars: 12500/30000 -> round 0 -> floor 1
    assert max_views(12500, 30000, 2) == 1
    # N-ImageNet: 135000/70000 -> 2
    assert max_views(135000, 70000, 2) == 2
    assert max_views(135000, 70000, 10) == 2


def test_gather_windows_pads_and_masks(rng):
    ev = make_events(rng, 150)
    wins, valid = gather_event_windows(ev, window=100, num_views=4, rng=rng)
    assert wins.shape == (4, 100, 4)
    # 150 events, rem 50 -> single full window
    np.testing.assert_array_equal(valid, [True, False, False, False])
    np.testing.assert_array_equal(wins[0], ev[:100])
    assert (wins[1:] == 0).all()


def test_gather_windows_subsamples(rng):
    ev = make_events(rng, 1000)
    wins, valid = gather_event_windows(ev, window=100, num_views=3, rng=rng)
    assert valid.all()
    # every selected window must be one of the stream's 10 true windows
    true = {tuple(ev[a:b, 2]) for a, b in [(k * 100, (k + 1) * 100) for k in range(10)]}
    for w in wins:
        assert tuple(w[:, 2]) in true


def test_gather_short_stream_pads_with_zero_polarity(rng):
    ev = make_events(rng, 30)
    wins, valid = gather_event_windows(ev, window=100, num_views=2, rng=rng)
    assert valid.tolist() == [True, False]
    assert (wins[0, 30:, 3] == 0).all()  # padding rows carry p == 0
