"""Native host data path (eventclip_tpu/native) vs the numpy reference path.

Bit parity is the contract: the fused C++ kernel must reproduce
data/host_ops.py's center/tflip/shift/hflip chain and window packing
EXACTLY (those numpy ops are themselves bit-parity-tested against the
reference's imported code in test_reference_parity.py, so transitively the
native path carries the same guarantee).
"""

import os

import numpy as np
import pytest

from eventclip_tpu import native
from eventclip_tpu.data import host_ops

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++?)"
)


@pytest.fixture
def force_path(monkeypatch):
    """Switch the host-ops dispatch between numpy and native."""

    def _set(mode: str):
        monkeypatch.setenv("EVENTCLIP_NATIVE", "1" if mode == "native" else "0")
        native.reset_for_tests()

    yield _set
    native.reset_for_tests()


def random_stream(rng, n, H=180, W=240, tmax=0.3):
    return np.stack([
        rng.integers(0, W, n).astype(np.float32),
        rng.integers(0, H, n).astype(np.float32),
        np.sort(rng.random(n).astype(np.float32)) * tmax,
        rng.choice([-1.0, 1.0], n).astype(np.float32),
    ], 1)


def numpy_chain(ev, H, W, tflip, dx, dy, hflip, do_shift=True):
    out = host_ops.center_events(ev.copy(), (H, W))
    if tflip:
        out = host_ops.tflip_events(out, p=1.0)
    if do_shift:
        out = host_ops.shift_events_by(out, dx, dy, (H, W))
    if hflip:
        out = host_ops.hflip_events(out, resolution=(H, W), p=1.0)
    return out


@pytest.mark.parametrize("n", [1, 2, 37, 5000])
def test_transform_matches_numpy_chain(n):
    rng = np.random.default_rng(n)
    H, W = 180, 240
    for _ in range(40):
        ev = random_stream(rng, n, H, W)
        tflip, hflip = bool(rng.random() < 0.5), bool(rng.random() < 0.5)
        dx, dy = (int(v) for v in rng.integers(-20, 21, size=2))
        want = numpy_chain(ev, H, W, tflip, dx, dy, hflip)
        got = native.transform_events(
            ev, (H, W), center=True, tflip=tflip, shift=(dx, dy), hflip=hflip
        )
        assert want.dtype == got.dtype == np.float32
        assert want.shape == got.shape
        assert (want == got).all()


def test_transform_center_only_and_input_unmutated():
    rng = np.random.default_rng(0)
    ev = random_stream(rng, 500)
    before = ev.copy()
    got = native.transform_events(ev, (180, 240), center=True)
    assert (ev == before).all(), "native transform must not mutate its input"
    assert (got == host_ops.center_events(ev.copy(), (180, 240))).all()


def test_transform_can_drop_everything():
    # a tight cluster shifted far out of frame: every event dropped, like
    # shift_events' out-of-bounds rule (the dataset resamples on empty)
    ev = np.tile(np.array([[5.0, 5.0, 0.0, 1.0]], np.float32), (64, 1))
    ev[:, 2] = np.linspace(0, 1, 64)
    got = native.transform_events(
        ev, (32, 32), center=False, shift=(100, 100)
    )
    assert got.shape == (0, 4)


def test_tta_variants_both_paths_agree(force_path):
    rng = np.random.default_rng(7)
    ev = host_ops.center_events(random_stream(rng, 3000), (180, 240))
    force_path("numpy")
    a = host_ops.tta_variants(ev, (180, 240))
    force_path("native")
    b = host_ops.tta_variants(ev, (180, 240))
    assert len(a) == len(b) == 4
    for x, y in zip(a, b):
        assert (x == y).all()


@pytest.mark.parametrize("packed", [True, False])
@pytest.mark.parametrize("n,window,views", [
    (50, 100, 3),      # single short window
    (950, 100, 5),     # subsample (9 full + tail > 5 slots)
    (230, 100, 5),     # tail-window rule (rem 30 <= N/2: no tail)
    (260, 100, 5),     # tail-window rule (rem 60 > N/2: tail)
])
def test_gather_windows_both_paths_agree(force_path, packed, n, window, views):
    rng = np.random.default_rng(n)
    ev = random_stream(rng, n)
    force_path("numpy")
    w1, v1 = host_ops.gather_event_windows(
        ev, window, views, rng=np.random.default_rng(1), packed=packed)
    force_path("native")
    w2, v2 = host_ops.gather_event_windows(
        ev, window, views, rng=np.random.default_rng(1), packed=packed)
    assert w1.dtype == w2.dtype and (w1 == w2).all()
    assert (v1 == v2).all()


def test_dataset_items_identical_across_paths(force_path, tmp_path):
    """End-to-end per-item parity: an augmenting NCaltech101 item (load ->
    center -> tflip/shift/hflip -> window pack) is bit-identical whichever
    path serves it — including the rng draw sequence (draw_augment)."""
    from eventclip_tpu.data.datasets import NCaltech101
    from eventclip_tpu.data.event_windows import EventWindowDataset

    rng = np.random.default_rng(3)
    root = tmp_path / "train"
    for cls in ("a", "b"):
        d = root / cls
        d.mkdir(parents=True)
        for i in range(2):
            np.save(d / f"s{i}.npy", random_stream(rng, 400))

    def snapshot():
        ds = NCaltech101(str(root), augmentation=True, seed=0)
        ds.flip_time = True  # exercise every augment branch
        wds = EventWindowDataset(
            ds, {"N": 120, "split_method": "event_count", "max_imgs": 3},
            seed=0,
        )
        return [wds[i] for i in range(len(wds))]

    force_path("numpy")
    a = snapshot()
    force_path("native")
    b = snapshot()
    for x, y in zip(a, b):
        assert x["label"] == y["label"]
        assert (x["windows"] == y["windows"]).all()
        assert (x["valid_mask"] == y["valid_mask"]).all()


def test_numpy_fallback_when_disabled(force_path):
    force_path("numpy")
    assert not native.available()
    rng = np.random.default_rng(0)
    ev = random_stream(rng, 64)
    out = host_ops.prepare_stream(ev, (180, 240))
    assert (out == host_ops.center_events(ev.copy(), (180, 240))).all()


def test_build_is_idempotent(tmp_path):
    out = tmp_path / "lib.so"
    assert native.build(str(out), quiet=False)
    assert native.build(str(out), quiet=False)
    assert out.exists()


def test_stale_source_triggers_rebuild(monkeypatch):
    """A .so older than event_ops.cpp is rebuilt on load (upgrades of the
    checkout must not silently serve an old kernel)."""
    st = os.stat(native.LIB)
    os.utime(native.LIB, (st.st_atime, os.path.getmtime(native.SRC) - 10))
    native.reset_for_tests()
    assert native.available()
    assert os.path.getmtime(native.LIB) >= os.path.getmtime(native.SRC)


def test_threaded_items_match_serial():
    """The ctypes kernels run GIL-free on loader threads; concurrent calls
    must produce the same bytes as serial access (no shared scratch)."""
    from concurrent.futures import ThreadPoolExecutor

    rng = np.random.default_rng(11)
    streams = [random_stream(rng, int(rng.integers(500, 4000)))
               for _ in range(32)]

    def work(i):
        ev = native.transform_events(
            streams[i], (180, 240), center=True, tflip=bool(i % 2),
            shift=(i % 7 - 3, i % 5 - 2), hflip=bool(i % 3 == 0),
        )
        return native.pack_spans(
            ev, [(0, min(len(ev), 300))], 2, 300, packed=True
        )

    serial = [work(i) for i in range(32)]
    with ThreadPoolExecutor(max_workers=8) as ex:
        threaded = list(ex.map(work, range(32)))
    for a, b in zip(serial, threaded):
        assert (a == b).all()


def test_pack_spans_rejects_bad_spans():
    """Out-of-bounds spans must raise like the numpy path did, not write
    past the output buffer in C."""
    rng = np.random.default_rng(0)
    ev = random_stream(rng, 100)
    with pytest.raises(ValueError, match="view slots"):
        native.pack_spans(ev, [(0, 50), (50, 100), (0, 100)], 2, 100)
    with pytest.raises(ValueError, match="out of bounds"):
        native.pack_spans(ev, [(0, 200)], 2, 100)  # span longer than window
    with pytest.raises(ValueError, match="out of bounds"):
        native.pack_spans(ev, [(80, 130)], 2, 100)  # past end of stream
    with pytest.raises(ValueError, match="out of bounds"):
        native.pack_spans(ev, [(-10, 40)], 2, 100)  # negative start


def test_build_failure_falls_back_not_raises(tmp_path):
    """An unwritable package dir (read-only install) must degrade to the
    numpy path, not crash the first loader item. (chmod can't model
    read-only for root, so a nonexistent dir stands in — same OSError
    from mkstemp.)"""
    target = tmp_path / "no" / "such" / "dir" / "lib.so"
    assert native.build(str(target), quiet=True) is False


def test_stale_rebuild_failure_warns(monkeypatch):
    """If the .so is older than the source and the rebuild fails, the stale
    kernel loads with a LOUD warning (silent staleness could break the
    bit-parity contract)."""
    st = os.stat(native.LIB)
    os.utime(native.LIB, (st.st_atime, os.path.getmtime(native.SRC) - 10))
    monkeypatch.setattr(native, "build", lambda *a, **k: False)
    native.reset_for_tests()
    with pytest.warns(UserWarning, match="STALE native kernels"):
        assert native.available()  # still loads the old .so
    native.reset_for_tests()
    native.build()  # restore a fresh artifact for later tests
    native.reset_for_tests()


def _reference_npz_chain(ev):
    out = np.stack(
        [ev["x"], ev["y"], ev["t"], ev["p"].astype(np.uint8)], 1
    ).astype(np.float64)
    out[:, 2] /= 1e6
    if out[:, 3].min() >= -0.5:
        out[:, 3][out[:, 3] <= 0.5] = -1
    return out.astype(np.float32)


@pytest.mark.parametrize("dt", [
    [("x", "<u2"), ("y", "<u2"), ("t", "<i8"), ("p", "?")],    # real N-IN
    [("x", "<i4"), ("y", "<i4"), ("t", "<u8"), ("p", "<i1")],  # ±1 int8
    [("x", "<f4"), ("y", "<f8"), ("t", "<f8"), ("p", "<u1")],  # float coords
    [("x", "<u2"), ("y", "<u2"), ("t", "<i4"), ("p", "<i2")],
])
def test_decode_struct_matches_reference_chain(dt):
    rng = np.random.default_rng(len(dt[3][1]))
    n = 5000
    ev = np.zeros(n, dtype=dt)
    ev["x"] = rng.integers(0, 640, n)
    ev["y"] = rng.integers(0, 480, n)
    tmax = 10 ** 9 if np.dtype(dict(dt)["t"]).itemsize == 8 else 10 ** 6
    ev["t"] = np.sort(rng.integers(0, tmax, n))
    pk = np.dtype(dict(dt)["p"]).kind
    if pk == "b":
        ev["p"] = rng.integers(0, 2, n).astype(bool)
    else:
        ev["p"] = rng.choice([-1, 1] if pk == "i" else [0, 1], n)
    got = native.decode_struct(ev)
    assert got is not None and got.dtype == np.float32
    np.testing.assert_array_equal(got, _reference_npz_chain(ev))


def test_decode_struct_falls_back_outside_envelope():
    # float polarity: numpy's negative-float->uint8 cast is platform-defined
    evf = np.zeros(8, dtype=[("x", "<u2"), ("y", "<u2"), ("t", "<i8"),
                             ("p", "<f4")])
    assert native.decode_struct(evf) is None
    # missing field
    evm = np.zeros(8, dtype=[("x", "<u2"), ("y", "<u2"), ("t", "<i8")])
    assert native.decode_struct(evm) is None
    # non-structured input
    assert native.decode_struct(np.zeros((8, 4), np.float32)) is None


def test_load_event_npz_native_and_numpy_agree(force_path, tmp_path):
    from eventclip_tpu.data.datasets import load_event_npz

    rng = np.random.default_rng(0)
    n = 3000
    ev = np.zeros(n, dtype=[("x", "<u2"), ("y", "<u2"), ("t", "<i8"),
                            ("p", "?")])
    ev["x"] = rng.integers(0, 640, n)
    ev["y"] = rng.integers(0, 480, n)
    ev["t"] = np.sort(rng.integers(0, 10 ** 9, n))
    ev["p"] = rng.integers(0, 2, n).astype(bool)
    path = str(tmp_path / "a.npz")
    np.savez(path, event_data=ev)
    force_path("native")
    a = load_event_npz(path)
    force_path("numpy")
    b = load_event_npz(path)
    np.testing.assert_array_equal(a, b)


def test_empty_stream_center_raises_like_numpy():
    """Corrupt (0-event) inputs: the numpy path raises from the empty
    .min() reduction in center_events; the native path must be equally
    loud, not silently return an empty stream."""
    empty = np.zeros((0, 4), np.float32)
    with pytest.raises(ValueError):
        host_ops.center_events(empty.copy(), (180, 240))
    with pytest.raises(ValueError):
        native.transform_events(empty, (180, 240), center=True)
    # without centering an empty stream is legal (post-shift emptiness is
    # the dataset's documented resample case)
    assert native.transform_events(empty, (180, 240)).shape == (0, 4)
