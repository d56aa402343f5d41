"""Dataset layer tests on synthetic event trees."""

import gzip
import json
import os

import numpy as np
import pytest

from eventclip_tpu.data import (
    EventWindowDataset,
    NCaltech101,
    NCars,
    NImageNetMini,
    PrefetchLoader,
    build_dataset,
)
from eventclip_tpu.data.datasets import imagenet_folder2name, load_split_asset
from eventclip_tpu.utils.config import Params


def write_events(path, n, H=180, W=240, rng=None):
    rng = rng or np.random.default_rng(0)
    ev = np.stack(
        [
            rng.integers(0, W, n),
            rng.integers(0, H, n),
            np.sort(rng.uniform(0, 0.3, n)),
            rng.choice([-1.0, 1.0], n),
        ],
        axis=1,
    ).astype(np.float64)
    np.save(path, ev)


def make_caltech_tree(root, classes=("airplanes", "ant", "brain"),
                      files_per_class=4, n_events=3000):
    rng = np.random.default_rng(7)
    for c in classes:
        d = os.path.join(root, "training", c)
        os.makedirs(d, exist_ok=True)
        for i in range(files_per_class):
            write_events(os.path.join(d, f"{c}_{i:03d}.npy"),
                         n_events + 100 * i, rng=rng)
        d = os.path.join(root, "testing", c)
        os.makedirs(d, exist_ok=True)
        for i in range(2):
            write_events(os.path.join(d, f"{c}_{i:03d}.npy"), n_events,
                         rng=rng)
    return root


class CaltechParams(Params):
    dataset = "n_caltech"
    data_root = ""
    quantize_args = dict(
        max_imgs=2,
        split_method="event_count",
        convert_method="event_histogram",
        N=1000,
        grayscale=True,
        count_non_zero=False,
        background_mask=True,
    )


def test_caltech_classes_and_renames(tmp_path):
    make_caltech_tree(str(tmp_path))
    ds = NCaltech101(str(tmp_path / "training"))
    # 'airplanes' renamed to 'airplane' (CoOp map), rest untouched
    assert ds.classes == ["airplane", "ant", "brain"]
    assert len(ds) == 12
    item = ds[0]
    assert item["events"].shape[1] == 4
    assert item["label"] == 0
    # events are centered: bounding box midpoint ~ frame center
    ev = item["events"]
    assert abs((ev[:, 0].max() + ev[:, 0].min()) / 2 - 240 / 2) < 2
    assert ev[:, 2].min() == 0


def test_few_shot_sampling_deterministic(tmp_path):
    make_caltech_tree(str(tmp_path))
    a = NCaltech101(str(tmp_path / "training"), num_shots=2)
    b = NCaltech101(str(tmp_path / "training"), num_shots=2)
    assert len(a) == 6
    assert list(a.labeled_files) == list(b.labeled_files)
    assert list(a.labels) == [0, 0, 1, 1, 2, 2]


def test_few_shot_repeat_oversampling(tmp_path):
    make_caltech_tree(str(tmp_path), files_per_class=3)
    ds = NCaltech101(str(tmp_path / "training"), num_shots=5, repeat=True)
    assert len(ds) == 15  # oversampled with replacement
    ds = NCaltech101(str(tmp_path / "training"), num_shots=5, repeat=False)
    assert len(ds) == 9  # keeps all available


def test_shipped_split_assets_present():
    # all 31 reference splits must be loadable
    counts = {
        "NCaltech101": [1, 2, 3, 5, 10, 20, 50],
        "NCars": [10, 20, 30, 50, 100, 200, 500],
        "NImageNet": [1, 2, 3, 5, 10, 20, 50],
        "NImageNetMini": [1, 2, 3, 5, 10, 20, 50],
    }
    for name, shots in counts.items():
        for k in shots:
            repeat = name in ("NCaltech101", "NImageNetMini")
            split = load_split_asset(name, k, repeat)
            if split is None and name == "NCars":
                split = load_split_asset(name, k, False)
            assert split, (name, k)
            assert all(isinstance(v, int) for v in split.values())


def test_split_asset_path_resolution(tmp_path):
    # a dataset rooted elsewhere resolves shipped split paths by cls/file
    make_caltech_tree(str(tmp_path), classes=("airplanes", "ant"))
    root = str(tmp_path / "training")
    split = {"data/N-Caltech101/training/ant/ant_001.npy": 1}
    os.makedirs(tmp_path / "assets" / "NCaltech101", exist_ok=True)
    ds = NCaltech101(root)
    assert ds._resolve_split_path(
        "data/N-Caltech101/training/ant/ant_001.npy"
    ) == os.path.join(root, "ant", "ant_001.npy")


def test_imagenet_folder2name_table():
    m = imagenet_folder2name()
    assert len(m) == 1000
    assert m["n01440764"] == "tench"


def test_imagenet_mini_classes(tmp_path):
    m = imagenet_folder2name()
    from eventclip_tpu.data import MINI_NAMES

    wnids = [k for k, v in m.items() if v in MINI_NAMES]
    root = tmp_path / "extracted_val"
    rng = np.random.default_rng(0)
    for w in wnids:
        os.makedirs(root / w, exist_ok=True)
    # put npz events in the first three classes
    for w in wnids[:3]:
        ev = np.zeros(
            500,
            dtype=[("x", "<u2"), ("y", "<u2"), ("t", "<i8"), ("p", "?")],
        )
        ev["x"] = rng.integers(0, 640, 500)
        ev["y"] = rng.integers(0, 480, 500)
        ev["t"] = np.sort(rng.integers(0, 55000, 500))
        ev["p"] = rng.integers(0, 2, 500).astype(bool)
        np.savez(root / w / "a.npz", event_data=ev)
    ds = NImageNetMini(str(root))
    assert len(ds.classes) == 100
    assert len(ds) == 3
    item = ds[0]
    ev = item["events"]
    assert set(np.unique(ev[:, 3])) <= {-1.0, 1.0}  # 0/1 -> -1/+1
    assert ev[:, 2].max() < 1.0  # microseconds -> seconds, then zero-based


def test_window_dataset_and_build(tmp_path):
    make_caltech_tree(str(tmp_path))
    params = CaltechParams(data_root=str(tmp_path))
    train, val = build_dataset(params)
    assert isinstance(train, EventWindowDataset)
    # view budget: max_n=225000 / N=1000 -> 225 -> clamped to max_imgs=2
    assert train.max_imgs == 2
    assert val.max_imgs == 10  # val forced to 10
    item = train[0]
    assert item["windows"].shape == (2, 1000, 3)
    assert item["windows"].dtype == np.int16
    assert item["valid_mask"].shape == (2,)
    assert item["valid_mask"].any()
    # ~3000 events, N=1000 -> 3 windows, subsampled to 2
    assert item["valid_mask"].all()


def test_window_dataset_tta(tmp_path):
    make_caltech_tree(str(tmp_path))
    params = CaltechParams(data_root=str(tmp_path))
    ds = build_dataset(params, gen_data=True, tta=True)
    item = ds[0]
    assert item["windows"].shape == (4, 10, 1000, 3)
    assert item["valid_mask"].shape == (4, 10)
    # h-flip variant mirrors x
    base = item["windows"][0][item["valid_mask"][0]]
    flip = item["windows"][1][item["valid_mask"][1]]
    live = base[..., 2] != 0  # packed layout: (x, y, p)
    np.testing.assert_allclose(
        flip[..., 0][live], 240 - 1 - base[..., 0][live]
    )


def test_keep_events_hack(tmp_path):
    make_caltech_tree(str(tmp_path))
    params = CaltechParams(data_root=str(tmp_path))
    _, val = build_dataset(params)
    val.keep_events = True
    item = val[0]
    assert "events" in item and item["events"].ndim == 2


class TestPrefetchLoader:
    def _ds(self, tmp_path):
        make_caltech_tree(str(tmp_path))
        params = CaltechParams(data_root=str(tmp_path))
        return build_dataset(params)

    def test_order_and_shapes(self, tmp_path):
        train, _ = self._ds(tmp_path)
        loader = PrefetchLoader(train, batch_size=4, shuffle=False,
                                num_workers=3)
        batches = list(loader)
        assert len(batches) == 3
        assert batches[0]["windows"].shape == (4, 2, 1000, 3)
        assert list(batches[0]["data_idx"]) == [0, 1, 2, 3]
        assert list(batches[2]["data_idx"]) == [8, 9, 10, 11]

    def test_shuffle_deterministic_per_epoch(self, tmp_path):
        train, _ = self._ds(tmp_path)
        loader = PrefetchLoader(train, batch_size=4, shuffle=True, seed=1)
        e0 = np.concatenate([b["data_idx"] for b in loader.epoch(0)])
        e0b = np.concatenate([b["data_idx"] for b in loader.epoch(0)])
        e1 = np.concatenate([b["data_idx"] for b in loader.epoch(1)])
        np.testing.assert_array_equal(e0, e0b)
        assert not np.array_equal(e0, e1)
        assert sorted(e0) == list(range(12))

    def test_pad_last(self, tmp_path):
        _, val = self._ds(tmp_path)  # 6 items
        loader = PrefetchLoader(val, batch_size=4, pad_last=True)
        batches = list(loader)
        assert len(batches) == 2
        assert batches[1]["windows"].shape[0] == 4
        np.testing.assert_array_equal(
            batches[1]["sample_mask"], [True, True, False, False]
        )

    def test_sharding(self, tmp_path):
        train, _ = self._ds(tmp_path)
        shards = [
            np.concatenate([
                b["data_idx"]
                for b in PrefetchLoader(
                    train, batch_size=4, shard_index=i, num_shards=2
                )
            ])
            for i in range(2)
        ]
        assert all(len(s) == 6 for s in shards)
        assert sorted(np.concatenate(shards)) == list(range(12))

    def test_error_propagation(self, tmp_path):
        train, _ = self._ds(tmp_path)

        class Boom:
            def __len__(self):
                return 8

            def __getitem__(self, i):
                if i == 5:
                    raise ValueError("boom")
                return train[0]

        loader = PrefetchLoader(Boom(), batch_size=4, num_workers=2)
        with pytest.raises(ValueError, match="boom"):
            list(loader)

    def test_host_sharding_partitions_every_batch(self):
        """Multi-host input feed (the DistributedSampler contract,
        torch-free): each host loads a disjoint 1/num_shards slice of every
        GLOBAL batch, slices across hosts union to the full batch, and the
        shuffle order agrees across hosts (same seed+epoch)."""

        class Ids:
            def __len__(self):
                return 24

            def __getitem__(self, i):
                import numpy as np
                return {"data_idx": np.int64(i)}

        def collect(shard):
            loader = PrefetchLoader(
                Ids(), batch_size=8, shuffle=True, drop_last=True,
                num_workers=2, seed=3, shard_index=shard, num_shards=2,
            )
            return [b["data_idx"].tolist() for b in loader.epoch(1)]

        a, b = collect(0), collect(1)
        assert len(a) == len(b) == 3
        for ba, bb in zip(a, b):
            assert len(ba) == len(bb) == 4  # local batch = global/num_shards
            assert not set(ba) & set(bb)  # disjoint
        union = sorted(x for ba, bb in zip(a, b) for x in ba + bb)
        assert union == list(range(24))  # every sample covered exactly once
        # identical order when both hosts draw the same epoch again
        assert collect(0) == a


def test_loader_pads_empty_trailing_shard():
    """A ragged final global batch can leave a trailing host shard with ZERO
    items; it must still emit a lockstep all-masked batch (the sharded eval
    step runs collectives — a host that crashes or skips deadlocks the
    others)."""

    class Tiny:
        def __len__(self):
            return 2  # ONE global batch of 8: shard 0 gets rows 0..1,
                      # shard 1 gets nothing

        def __getitem__(self, i):
            return {"data_idx": np.int64(i)}

    b0 = list(PrefetchLoader(Tiny(), batch_size=8, shard_index=0,
                             num_shards=2, pad_last=True))
    b1 = list(PrefetchLoader(Tiny(), batch_size=8, shard_index=1,
                             num_shards=2, pad_last=True))
    assert len(b0) == len(b1) == 1
    assert b0[0]["sample_mask"].tolist() == [True, True, False, False]
    assert b1[0]["sample_mask"].tolist() == [False] * 4
    assert b1[0]["data_idx"].shape == (4,)  # padded to the local batch
    # without pad_last the empty shard must fail loudly, not IndexError
    with pytest.raises(ValueError, match="got 0 of"):
        list(PrefetchLoader(Tiny(), batch_size=8, shard_index=1,
                            num_shards=2))


def test_device_prefetch_overlaps_one_batch_ahead():
    """device_prefetch must (a) preserve order, (b) place every batch
    exactly once, and (c) run at most `depth` placements ahead of the
    consumer — the double-buffering contract trainer.fit relies on to hide
    the H2D copy behind the dispatched step."""
    from eventclip_tpu.data import device_prefetch

    placed, yielded = [], []

    def place(b):
        placed.append(b)
        return b * 10

    gen = device_prefetch(iter(range(6)), place, depth=2)
    first = next(gen)
    yielded.append(first)
    # two placements happened before the first yield (the eager fill)...
    assert placed == [0, 1] and first == 0
    for b in gen:
        # ...and afterwards placement never runs more than depth ahead
        assert len(placed) <= len(yielded) + 2
        yielded.append(b)
    assert yielded == [0, 10, 20, 30, 40, 50]
    assert placed == list(range(6))

    # short iterators (fewer batches than depth) still drain completely
    assert list(device_prefetch(iter([7]), place, depth=2)) == [70]
    assert list(device_prefetch(iter([]), place, depth=2)) == []


def test_adaptive_prefetch_decides_and_reuses_depth():
    """adaptive_prefetch must (a) deliver every batch exactly once in
    order while A/B-probing, (b) land a depth decision in the shared
    choice dict once both probe windows fill, and (c) skip straight to
    device_prefetch at the decided depth on later epochs — the contract
    trainer.fit relies on to pay the A/B only once per run."""
    from eventclip_tpu.data import adaptive_prefetch

    choice: dict = {}
    placed = []

    def place(b):
        placed.append(b)
        return b * 10

    out = list(adaptive_prefetch(iter(range(12)), place, choice,
                                 warmup=1, probe=2))
    assert out == [b * 10 for b in range(12)]
    assert placed == list(range(12))
    assert choice.get("depth") in (1, 2)

    # a decided dict must bypass probing entirely and respect the depth
    placed.clear()
    forced = {"depth": 1}
    gen = adaptive_prefetch(iter(range(5)), place, forced)
    first = next(gen)
    assert first == 0 and placed == [0]  # depth 1: no eager extra fill
    assert list(gen) == [10, 20, 30, 40]
    assert forced == {"depth": 1}


def test_adaptive_prefetch_short_epoch_leaves_choice_open():
    # an epoch too short to finish both probe windows must still deliver
    # everything and leave the decision for the next epoch
    from eventclip_tpu.data import adaptive_prefetch

    choice: dict = {}
    out = list(adaptive_prefetch(iter(range(3)), place=lambda b: b,
                                 choice=choice, warmup=2, probe=4))
    assert out == [0, 1, 2]
    assert "depth" not in choice
    # choice=None (one-off callers) must not crash
    assert list(adaptive_prefetch(iter(range(3)), lambda b: b)) == [0, 1, 2]


def test_view_pack_buckets_and_pack_view_batch():
    from eventclip_tpu.data.loader import pack_view_batch, view_pack_buckets

    buckets = view_pack_buckets(80, align=8)
    assert buckets == [24, 40, 64, 80]
    assert all(k % 8 == 0 for k in buckets)
    # a non-align-divisible budget rounds the top bucket UP (every bucket
    # must stay shardable over the data axis; a few blank slots are cheap)
    assert view_pack_buckets(20, align=8) == [8, 16, 24]

    B, T, N = 4, 5, 16
    rng = np.random.default_rng(3)
    windows = rng.integers(-50, 50, size=(B, T, N, 3)).astype(np.int16)
    valid = np.zeros((B, T), dtype=bool)
    valid[0, :2] = valid[1, :1] = valid[2, :5] = valid[3, :3] = True  # 11
    batch = {"windows": windows, "valid_mask": valid,
             "label": np.arange(B, dtype=np.int32)}
    buckets = view_pack_buckets(B * T, align=4)  # [8, 12, 16, 20]
    out = pack_view_batch(batch, buckets)
    # 11 valid views -> smallest fitting bucket is 12
    assert out["windows"].shape == (12, N, 3)
    assert out["view_src"].shape == (12,)
    idx = np.flatnonzero(valid.reshape(-1))
    np.testing.assert_array_equal(out["view_src"][:11], idx)
    assert (out["view_src"][11:] == B * T).all()  # sentinel padding
    flat = windows.reshape(B * T, N, 3)
    np.testing.assert_array_equal(out["windows"][:11], flat[idx])
    assert (out["windows"][11:] == 0).all()
    # untouched keys pass through; original batch not mutated
    np.testing.assert_array_equal(out["label"], batch["label"])
    assert "view_src" not in batch
    # a batch that exceeds every bucket stays unpacked (padded path correct)
    full = {"windows": windows, "valid_mask": np.ones((B, T), bool)}
    assert "view_src" not in pack_view_batch(full, [8, 12])


def test_nin_npz_decode_parity(tmp_path):
    """load_event_npz's column-wise float32 decode is bit-identical to the
    reference-shaped chain (imagenet.py:8-27: stack -> float64 -> t/1e6 ->
    0/1->±1 remap -> float32 downcast) for every polarity encoding."""
    from eventclip_tpu.data.datasets import load_event_npz

    def reference_chain(ev):
        out = np.stack(
            [ev["x"], ev["y"], ev["t"], ev["p"].astype(np.uint8)], 1
        ).astype(np.float64)
        out[:, 2] /= 1e6
        if out[:, 3].min() >= -0.5:
            out[:, 3][out[:, 3] <= 0.5] = -1
        return out.astype(np.float32)

    rng = np.random.default_rng(0)
    n = 4096
    for pol in ("bool", "pm1"):
        ev = np.zeros(
            n, dtype=[("x", "<u2"), ("y", "<u2"), ("t", "<i8"),
                      ("p", "?" if pol == "bool" else "<i1")],
        )
        ev["x"] = rng.integers(0, 640, n)
        ev["y"] = rng.integers(0, 480, n)
        # large timestamps exercise the float64-divide-then-downcast rounding
        ev["t"] = np.sort(rng.integers(0, 10**9, n))
        if pol == "bool":
            ev["p"] = rng.integers(0, 2, n).astype(bool)
        else:
            ev["p"] = rng.choice(np.array([-1, 1], np.int8), n)
        path = tmp_path / f"{pol}.npz"
        np.savez(path, event_data=ev)
        got = load_event_npz(str(path))
        assert got.dtype == np.float32
        np.testing.assert_array_equal(got, reference_chain(ev))


def test_read_npz_member_raw_vs_zipfile(tmp_path):
    """The raw STORED-member reader returns the exact bytes np.load would,
    and degrades to None (np.load fallback) for compressed archives."""
    from eventclip_tpu.data.datasets import _read_npz_member, load_event_npz

    rng = np.random.default_rng(0)
    n = 2048
    ev = np.zeros(n, dtype=[("x", "<u2"), ("y", "<u2"), ("t", "<i8"),
                            ("p", "?")])
    ev["x"] = rng.integers(0, 640, n)
    ev["y"] = rng.integers(0, 480, n)
    ev["t"] = np.sort(rng.integers(0, 10 ** 8, n))
    ev["p"] = rng.integers(0, 2, n).astype(bool)
    plain, comp = str(tmp_path / "a.npz"), str(tmp_path / "c.npz")
    np.savez(plain, event_data=ev)
    np.savez_compressed(comp, event_data=ev)

    raw = _read_npz_member(plain, "event_data.npy")
    np.testing.assert_array_equal(raw, np.load(plain)["event_data"])
    assert _read_npz_member(comp, "event_data.npy") is None  # falls back
    assert _read_npz_member(plain, "nope.npy") is None
    assert _read_npz_member(str(tmp_path / "missing.npz"), "x.npy") is None
    # end to end: both archive flavours decode identically
    np.testing.assert_array_equal(load_event_npz(plain),
                                  load_event_npz(comp))


def test_load_event_npz_empty_stream_raises_on_both_paths(tmp_path,
                                                          monkeypatch):
    """A zero-event archive must fail loudly and IDENTICALLY on the native
    and numpy decode paths (round-3 review: the native pass used to return
    a silent (0, 4) array where numpy tripped over an empty reduction)."""
    from eventclip_tpu.data.datasets import load_event_npz

    ev = np.zeros(0, dtype=[("x", "<u2"), ("y", "<u2"), ("t", "<i8"),
                            ("p", "?")])
    path = str(tmp_path / "empty.npz")
    np.savez(path, event_data=ev)
    for flag in ("0", "1"):
        monkeypatch.setenv("EVENTCLIP_NATIVE", flag)
        with pytest.raises(ValueError, match="empty event_data"):
            load_event_npz(path)


def test_no_fast_npz_env_forces_nploader(tmp_path, monkeypatch):
    """EVENTCLIP_NO_FAST_NPZ=1 (bench.py's numpy-baseline mode) must route
    around the raw STORED-member reader while decoding identically."""
    from eventclip_tpu.data.datasets import _read_npz_member, load_event_npz

    rng = np.random.default_rng(3)
    n = 256
    ev = np.zeros(n, dtype=[("x", "<u2"), ("y", "<u2"), ("t", "<i8"),
                            ("p", "?")])
    ev["x"] = rng.integers(0, 640, n)
    ev["y"] = rng.integers(0, 480, n)
    ev["t"] = np.sort(rng.integers(0, 10 ** 8, n))
    ev["p"] = rng.integers(0, 2, n).astype(bool)
    path = str(tmp_path / "a.npz")
    np.savez(path, event_data=ev)
    fast = load_event_npz(path)
    monkeypatch.setenv("EVENTCLIP_NO_FAST_NPZ", "1")
    assert _read_npz_member(path, "event_data.npy") is None
    np.testing.assert_array_equal(fast, load_event_npz(path))


def test_pack_view_batch_sharded_mechanics(monkeypatch):
    """Multi-process packing: every host must pick the bucket that fits
    the BUSIEST shard (agreed via allgather), pack into its K/num_shards
    slice, and emit GLOBAL flat slot ids with the global sentinel."""
    from jax.experimental import multihost_utils

    from eventclip_tpu.data.loader import pack_view_batch, view_pack_buckets

    B, T, N = 4, 5, 16  # per-shard rows; global batch = 8
    rng = np.random.default_rng(4)
    counts = [5, 11]
    shards = []
    for count in counts:
        windows = rng.integers(-50, 50, size=(B, T, N, 3)).astype(np.int16)
        valid = np.zeros(B * T, dtype=bool)
        valid[rng.choice(B * T, count, replace=False)] = True
        shards.append({"windows": windows,
                       "valid_mask": valid.reshape(B, T)})
    # both "hosts" see the allgathered per-shard counts
    monkeypatch.setattr(
        multihost_utils, "process_allgather",
        lambda x: np.asarray([[c] for c in counts], dtype=np.int64),
    )
    buckets = view_pack_buckets(2 * B * T, align=8)  # [8, 16, 24, 32, 40]
    outs = [pack_view_batch(s, buckets, shard_index=i, num_shards=2)
            for i, s in enumerate(shards)]
    # global max is 11 -> smallest bucket with k//2 >= 11 is 24 -> 12/shard
    for i, (out, count) in enumerate(zip(outs, counts)):
        assert out["windows"].shape == (12, N, 3)
        idx = np.flatnonzero(shards[i]["valid_mask"].reshape(-1))
        np.testing.assert_array_equal(out["view_src"][:count],
                                      idx + i * B * T)
        assert (out["view_src"][count:] == 2 * B * T).all()  # global sentinel
        flat = shards[i]["windows"].reshape(B * T, N, 3)
        np.testing.assert_array_equal(out["windows"][:count], flat[idx])
    # a global batch that exceeds every bucket stays unpacked on EVERY host
    monkeypatch.setattr(
        multihost_utils, "process_allgather",
        lambda x: np.asarray([[B * T], [B * T]], dtype=np.int64),
    )
    for i, s in enumerate(shards):
        assert "view_src" not in pack_view_batch(s, [8, 16], i, 2)
