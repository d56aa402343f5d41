"""serve.Predictor: the batch-inference API must reproduce the eval
pipeline's predictions without a dataset tree on disk."""

import os

import numpy as np
import pytest

from eventclip_tpu.serve import Predictor
from eventclip_tpu.utils.config import Params


class _TinyZS(Params):
    gpus = 1
    dataset = "n_caltech"
    data_root = "/nonexistent"  # serving never touches it
    train_batch_size = 4
    val_batch_size = 8
    quantize_args = dict(
        max_imgs=2, N=1000, split_method="event_count",
        convert_method="event_histogram", grayscale=True,
        count_non_zero=False, background_mask=True,
    )
    model = "ZSCLIP"
    clip_dict = dict(arch="ViT-T/8@32",
                     prompt="a point cloud image of a {}",
                     agg_func="mean")
    bf16 = False


def _streams(rng, n=5):
    out = []
    for _ in range(n):
        k = 2500 + int(rng.integers(0, 2000))
        out.append(np.stack([
            rng.integers(0, 240, k),
            rng.integers(0, 180, k),
            np.sort(rng.uniform(0, 0.3, k)),
            rng.choice([-1.0, 1.0], k),
        ], axis=1))
    return out


@pytest.fixture(scope="module")
def predictor():
    return Predictor(_TinyZS(), class_names=["airplanes", "ant", "brain"],
                     smoke=True, batch_size=4)


def test_predict_shapes_and_alignment(predictor):
    rng = np.random.default_rng(5)
    streams = _streams(rng, n=5)  # forces a padded second chunk (bs=4)
    out = predictor.predict(streams, top_k=2)
    assert out["probs"].shape == (5, 3)
    assert out["label"].shape == (5,)
    assert len(out["names"]) == 5
    assert out["topk"].shape == (5, 2)
    np.testing.assert_allclose(out["probs"].sum(-1), 1.0, atol=1e-4)
    assert all(n in ("airplanes", "ant", "brain") for n in out["names"])
    # argmax consistency between the returned views
    np.testing.assert_array_equal(out["topk"][:, 0], out["label"])


def test_batching_invariance(predictor):
    """Chunked/padded execution must not change any row's prediction —
    including for streams long enough to trigger random view subsampling
    (content-seeded, so position in the request cannot matter)."""
    rng = np.random.default_rng(6)
    streams = _streams(rng, n=6)
    # > views * N events: exercises the subsample path (views=10, N=1000)
    k = 14000
    streams[2] = np.stack([
        rng.integers(0, 240, k), rng.integers(0, 180, k),
        np.sort(rng.uniform(0, 0.3, k)), rng.choice([-1.0, 1.0], k),
    ], axis=1)
    full = predictor.predict(streams)["probs"]
    one_by_one = np.concatenate(
        [predictor.predict([s])["probs"] for s in streams]
    )
    np.testing.assert_allclose(full, one_by_one, rtol=1e-4, atol=1e-5)


def test_int8_predictor_runs():
    pred = Predictor(_TinyZS(), class_names=["a", "b", "c"], smoke=True,
                     int8=True, batch_size=2)
    rng = np.random.default_rng(7)
    out = pred.predict(_streams(rng, n=3))
    assert out["probs"].shape == (3, 3)


def test_int8_calibrated_predictor_matches_dynamic():
    """Static activation scales calibrated on representative streams must
    keep the dynamic-int8 predictions (same weights, same traffic)."""
    rng = np.random.default_rng(8)
    calib = _streams(rng, n=4)
    dyn = Predictor(_TinyZS(), class_names=["a", "b", "c"], smoke=True,
                    int8=True, batch_size=2)
    stat = Predictor(_TinyZS(), class_names=["a", "b", "c"], smoke=True,
                     int8=True, int8_calib_streams=calib, batch_size=2)
    streams = _streams(np.random.default_rng(9), n=3)
    d = dyn.predict(streams)
    s = stat.predict(streams)
    np.testing.assert_array_equal(d["label"], s["label"])
    np.testing.assert_allclose(d["probs"], s["probs"], atol=0.05)


def test_data_parallel_predictor_matches_single(predictor):
    """DP serving (batch sharded over the 8-device CPU mesh) must return
    the single-device predictions."""
    import jax

    if jax.device_count() < 2:
        pytest.skip("needs the multi-device CPU mesh")
    dp = Predictor(_TinyZS(), class_names=["airplanes", "ant", "brain"],
                   smoke=True, batch_size=8, data_parallel=True)
    assert dp.batch_size % jax.device_count() == 0
    rng = np.random.default_rng(12)
    streams = _streams(rng, n=5)
    np.testing.assert_allclose(
        dp.predict(streams)["probs"],
        predictor.predict(streams)["probs"], rtol=1e-4, atol=1e-5,
    )


def test_data_parallel_predictor_with_shardmap_raster(predictor,
                                                      monkeypatch):
    """DP serving with the shard_map rasterize route forced (the layout a
    multi-chip TPU server runs: each device rasterizes its local batch
    shard) must still match single-device predictions. The route gate is
    recorded to prove the forced trace actually happened — env knobs bind
    at trace time, so without the env-keyed jit this test would silently
    reuse the unforced trace of the DP test above (round-3 review)."""
    import jax

    from eventclip_tpu.ops import rasterize as RZ

    if jax.device_count() < 2:
        pytest.skip("needs the multi-device CPU mesh")
    monkeypatch.setenv("EVENTCLIP_SHARDMAP_RASTER", "force")
    routed = []
    orig = RZ._shardmap_raster_ok
    monkeypatch.setattr(
        RZ, "_shardmap_raster_ok",
        lambda w, m: routed.append(orig(w, m)) or routed[-1])
    dp = Predictor(_TinyZS(), class_names=["airplanes", "ant", "brain"],
                   smoke=True, batch_size=8, data_parallel=True)
    rng = np.random.default_rng(12)
    streams = _streams(rng, n=5)
    np.testing.assert_allclose(
        dp.predict(streams)["probs"],
        predictor.predict(streams)["probs"], rtol=1e-4, atol=1e-5,
    )
    assert any(routed), "forced shard_map route was never traced"


def test_pruned_predictor_runs():
    # fast path: int8 + token pruning stacked (tiny tower: 16 patches -> 8)
    pred = Predictor(_TinyZS(), class_names=["a", "b", "c"], smoke=True,
                     int8=True, prune_tokens=8, batch_size=2)
    rng = np.random.default_rng(10)
    out = pred.predict(_streams(rng, n=3))
    assert out["probs"].shape == (3, 3)
    np.testing.assert_allclose(out["probs"].sum(-1), 1.0, atol=1e-4)


def test_predict_does_not_mutate_input_and_is_repeatable(predictor):
    """center_events works in place; predict must operate on its own copy
    (a float32 input would otherwise alias through np.asarray), keeping the
    caller's array intact and repeat calls identical."""
    rng = np.random.default_rng(8)
    s = _streams(rng, n=1)[0].astype(np.float32)
    orig = s.copy()
    p1 = predictor.predict([s])["probs"]
    np.testing.assert_array_equal(s, orig)
    p2 = predictor.predict([s])["probs"]
    np.testing.assert_allclose(p1, p2)


def test_zero_one_polarity_matches_pm_one(predictor):
    """0/1-encoded polarity (raw N-ImageNet-style dumps) must be remapped
    to ±1 like the loaders do — the rasterizer treats p == 0 as padding, so
    an unmapped stream would silently drop every negative event."""
    rng = np.random.default_rng(9)
    s = _streams(rng, n=1)[0]
    s01 = s.copy()
    s01[:, 3] = (s01[:, 3] > 0).astype(np.float64)
    np.testing.assert_allclose(
        predictor.predict([s])["probs"],
        predictor.predict([s01])["probs"], rtol=1e-4, atol=1e-5,
    )


def test_rejects_malformed_streams(predictor):
    # bad inputs must identify WHICH stream in the request was bad, so
    # batch callers know what to drop
    with pytest.raises(ValueError, match=r"event_streams\[0\]"):
        predictor.predict([np.zeros((10, 3))])
    # an empty stream (idle sensor window) has no defined prediction; it
    # must fail with a clear message, not a numpy reduction error
    rng = np.random.default_rng(11)
    good = _streams(rng, n=1)[0]
    with pytest.raises(ValueError,
                       match=r"event_streams\[1\].*empty event stream"):
        predictor.predict([good, np.zeros((0, 4))])
    # an empty REQUEST is fine: empty, well-shaped result
    out = predictor.predict([])
    assert out["probs"].shape == (0, 3) and out["names"] == []


def test_trainable_model_requires_weight():
    """FSCLIP/FTCLIP served without a checkpoint would return random-adapter
    garbage; the constructor must refuse (test.py enforces the same)."""

    class _TinyFS(_TinyZS):
        model = "FSCLIP"
        adapter_dict = dict(adapter_type="trans", d_model=16, num_layers=1,
                            num_heads=2, ffn_dim=32, residual=0.8)

    with pytest.raises(ValueError, match="trainable weights"):
        Predictor(_TinyFS(), class_names=["a", "b", "c"], smoke=True)


def test_matches_dataset_window_path(predictor, tmp_path):
    """Serving must produce the same probs as the dataset/eval window path
    for the same underlying event files (short streams: both paths are
    fully deterministic, so equality is exact up to dispatch order)."""
    import jax.numpy as jnp

    from eventclip_tpu.data.datasets import NCaltech101
    from eventclip_tpu.data.event_windows import EventWindowDataset

    from .test_e2e import make_tree

    tree = make_tree(str(tmp_path / "t"))
    ds = EventWindowDataset(
        NCaltech101(os.path.join(tree, "testing")),
        dict(_TinyZS.quantize_args, max_imgs=10),
    )
    idxs = range(4)
    items = [ds[i] for i in idxs]
    wins = np.stack([it["windows"] for it in items])
    valid = np.stack([it["valid_mask"] for it in items])
    probs_ds = np.asarray(
        predictor._step(predictor._params, jnp.asarray(wins),
                        jnp.asarray(valid))
    )
    raw = [np.load(str(ds.event_dataset.labeled_files[i])) for i in idxs]
    probs_serve = predictor.predict(raw)["probs"]
    np.testing.assert_allclose(probs_serve, probs_ds, rtol=1e-4, atol=1e-5)


def test_packed_serving_matches_unpacked(predictor):
    """View packing (default) must not change any prediction: short streams
    (fewer windows than the view budget) run the packed program, and its
    probs must equal the pack_views=False padded program's."""
    plain = Predictor(_TinyZS(), class_names=["airplanes", "ant", "brain"],
                      smoke=True, batch_size=4, pack_views=False)
    assert predictor._buckets and not plain._buckets
    rng = np.random.default_rng(21)
    streams = _streams(rng, n=5)  # ~3-4 windows each of a 10-view budget
    np.testing.assert_allclose(
        predictor.predict(streams)["probs"],
        plain.predict(streams)["probs"], rtol=1e-4, atol=1e-5,
    )


def test_tta_predictor_matches_manual_variants(predictor):
    """tta=True must equal the mean of the 4 per-variant predictions made
    through a plain predictor (reference gen_data TTA aggregation,
    event2img.py _load_tta_data + gen_data.py:154). Short streams (fewer
    windows than the view budget) make windowing deterministic, so the
    comparison is exact up to f32 accumulation."""
    from eventclip_tpu.data.host_ops import hflip_events, tflip_events

    tta_pred = Predictor(_TinyZS(), class_names=["airplanes", "ant",
                                                 "brain"],
                         smoke=True, batch_size=4, tta=True)
    rng = np.random.default_rng(61)
    streams = _streams(rng, n=3)
    out = tta_pred.predict(streams, top_k=2)
    assert out["probs"].shape == (3, 3)
    np.testing.assert_allclose(out["probs"].sum(-1), 1.0, atol=1e-4)

    H, W = tta_pred.resolution
    manual = []
    for s in streams:
        # the same canonicalization predict applies before flipping
        e, _ = tta_pred._prep(s)
        h = hflip_events(e.copy(), resolution=(H, W), p=1.0)
        t = tflip_events(e.copy(), p=1.0)
        ht = tflip_events(h.copy(), p=1.0)
        per = [predictor.predict([v])["probs"][0] for v in (e, h, t, ht)]
        manual.append(np.mean(per, axis=0))
    np.testing.assert_allclose(out["probs"], np.stack(manual),
                               rtol=1e-4, atol=1e-5)


def test_embed_shapes_norm_and_batch_invariance():
    pred = Predictor(_TinyZS(), class_names=["airplanes", "ant", "brain"],
                     smoke=True, batch_size=4, embed=True)
    rng = np.random.default_rng(17)
    streams = _streams(rng, n=5)  # forces a padded second chunk (bs=4)
    feats = pred.embed(streams)
    assert feats.shape[0] == 5 and feats.dtype == np.float32
    np.testing.assert_allclose(np.linalg.norm(feats, axis=-1), 1.0,
                               atol=1e-4)
    # content-addressed: row order must not change a stream's embedding
    swapped = pred.embed([streams[1], streams[0]])
    np.testing.assert_allclose(swapped[0], feats[1], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(swapped[1], feats[0], rtol=1e-5, atol=1e-6)
    # distinct streams embed distinctly
    assert not np.allclose(feats[0], feats[1])
    # empty request: [0, C] of the tower's width
    empty = pred.embed([])
    assert empty.shape == (0, feats.shape[1])


def test_embed_requires_opt_in(predictor):
    rng = np.random.default_rng(18)
    with pytest.raises(RuntimeError, match="embed=True"):
        predictor.embed(_streams(rng, n=1))


def test_embed_tta_unit_norm_and_deterministic():
    pred = Predictor(_TinyZS(), class_names=["airplanes", "ant", "brain"],
                     smoke=True, batch_size=4, embed=True, tta=True)
    rng = np.random.default_rng(19)
    streams = _streams(rng, n=2)
    feats = pred.embed(streams)
    assert feats.shape[0] == 2
    np.testing.assert_allclose(np.linalg.norm(feats, axis=-1), 1.0,
                               atol=1e-4)
    np.testing.assert_allclose(pred.embed(streams), feats,
                               rtol=1e-5, atol=1e-6)


def test_set_classes_swaps_label_space():
    pred = Predictor(_TinyZS(), class_names=["airplanes", "ant", "brain"],
                     smoke=True, batch_size=4)
    rng = np.random.default_rng(20)
    streams = _streams(rng, n=2)
    out3 = pred.predict(streams)
    assert out3["probs"].shape == (2, 3)
    new = ["cup", "chair", "lamp", "pizza", "scissors"]
    pred.set_classes(new)
    out5 = pred.predict(streams)
    assert out5["probs"].shape == (2, 5)
    assert all(n in new for n in out5["names"])
    np.testing.assert_allclose(out5["probs"].sum(-1), 1.0, atol=1e-4)
    with pytest.raises(ValueError, match="non-empty"):
        pred.set_classes([])


def test_set_classes_rejects_prompt_tuned():
    import dataclasses

    pred = Predictor(_TinyZS(), class_names=["a", "b", "c"],
                     smoke=True, batch_size=4)
    pred._cfg = dataclasses.replace(pred._cfg, prompt_tuning=True)
    with pytest.raises(ValueError, match="prompt-tunes"):
        pred.set_classes(["x", "y"])


def test_stream_session_matches_batch_predict(predictor):
    """A session's rolling prediction over its buffer must equal
    Predictor.predict on the same events — one pipeline, by construction
    (and asserted anyway, so a future session-side shortcut can't drift)."""
    from eventclip_tpu.serve import StreamSession

    rng = np.random.default_rng(11)
    stream = _streams(rng, n=1)[0]
    sess = StreamSession(predictor)
    # sensor-style chunked arrival, including a quiet (empty) interval
    n = 0
    for chunk in np.array_split(stream, 4):
        n = sess.append(chunk)
    sess.append(np.empty((0, 4)))
    sess.append([])  # JSON decoders hand a quiet interval over as []
    assert n == sess.n_events == len(stream)

    got = sess.predict(top_k=2)
    want = predictor.predict([stream], top_k=2)
    assert got["label"] == int(want["label"][0])
    assert got["name"] == want["names"][0]
    np.testing.assert_allclose(got["probs"], want["probs"][0],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(got["topk"], want["topk"][0])
    assert got["n_events"] == len(stream)


def test_stream_session_ring_buffer_keeps_most_recent(predictor):
    """Appending past the horizon must slide the window: the prediction
    equals a fresh predict on exactly the last `horizon` events."""
    from eventclip_tpu.serve import StreamSession

    rng = np.random.default_rng(12)
    horizon = 2 * predictor.window
    sess = StreamSession(predictor, horizon=horizon)
    chunks = [_streams(rng, n=1)[0] for _ in range(3)]
    for c in chunks:
        sess.append(c)
    assert sess.n_events == horizon
    tail = np.concatenate(chunks)[-horizon:]
    np.testing.assert_allclose(
        sess.predict()["probs"], predictor.predict([tail])["probs"][0],
        rtol=1e-5, atol=1e-6,
    )
    sess.reset()
    assert sess.n_events == 0


def test_stream_session_validation(predictor):
    from eventclip_tpu.serve import StreamSession

    sess = StreamSession(predictor)
    with pytest.raises(ValueError, match="empty session"):
        sess.predict()
    with pytest.raises(ValueError, match="x/y/t/p"):
        sess.append(np.zeros((5, 3)))
    with pytest.raises(ValueError, match="horizon"):
        StreamSession(predictor, horizon=predictor.window - 1)


def test_stream_session_trim_property(rng):
    """Property test of the ring-buffer trim across adversarial chunkings
    (empty chunks, chunks larger than the whole horizon, exact-boundary
    hits): after every append the buffer must equal the concatenation's
    last `horizon` rows exactly. Pure buffer math — a stub predictor
    provides the window/view geometry."""
    from eventclip_tpu.serve import StreamSession

    class _Stub:
        views, window = 4, 50

    for seed in range(5):
        r = np.random.default_rng(seed)
        sess = StreamSession(_Stub(), horizon=200)
        everything = []
        for _ in range(60):
            n = int(r.choice([0, 1, 7, 50, 199, 200, 201, 520]))
            chunk = r.normal(size=(n, 4)).astype(np.float32)
            got_n = sess.append(chunk)
            everything.append(chunk)
            want = np.concatenate(everything)[-200:]
            assert got_n == sess.n_events == len(want)
            np.testing.assert_array_equal(sess.events(), want)


def test_int8_data_parallel_matches_single_device():
    """--int8 and data-parallel serving must compose: the two throughput
    features multiply exactly on the sweep/serving workloads."""
    import jax

    if jax.device_count() < 2:
        pytest.skip("needs the multi-device CPU mesh")
    names = ["airplanes", "ant", "brain"]
    single = Predictor(_TinyZS(), class_names=names, smoke=True, int8=True,
                       batch_size=8)
    dp = Predictor(_TinyZS(), class_names=names, smoke=True, int8=True,
                   batch_size=8, data_parallel=True)
    rng = np.random.default_rng(13)
    streams = _streams(rng, n=5)
    np.testing.assert_allclose(
        dp.predict(streams)["probs"],
        single.predict(streams)["probs"], rtol=1e-4, atol=1e-5,
    )
