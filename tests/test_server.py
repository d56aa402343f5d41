"""HTTP serving endpoint (eventclip_tpu/server.py): route contracts and
response/Predictor agreement. The reference has no serving surface; the
library-level pipeline parity is covered by tests/test_serve.py — here we
only verify the HTTP layer decodes/encodes faithfully."""

import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from eventclip_tpu.serve import Predictor
from eventclip_tpu.server import make_server, resolve_class_names
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


NAMES = ["airplanes", "ant", "brain"]


def _streams(rng, n):
    out = []
    for _ in range(n):
        k = 2500 + int(rng.integers(0, 2000))
        out.append(np.stack([
            rng.integers(0, 240, k),
            rng.integers(0, 180, k),
            np.sort(rng.uniform(0, 0.3, k)),
            rng.choice([-1.0, 1.0], k),
        ], axis=1).astype(np.float32))
    return out


@pytest.fixture(scope="module")
def served():
    pred = Predictor(_TinyZS(), class_names=NAMES, smoke=True, batch_size=4)
    server = make_server(pred, "127.0.0.1", 0)  # ephemeral port
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    yield pred, url
    server.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, json.loads(r.read())


def _post(url, body, ctype="application/json"):
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": ctype}, method="POST")
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.loads(r.read())


def _post_err(url, body, ctype="application/json"):
    try:
        _post(url, body, ctype)
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())
    raise AssertionError("expected an HTTP error")


def test_healthz_and_classes(served):
    _, url = served
    code, h = _get(url + "/healthz")
    assert code == 200
    assert h["status"] == "ok" and h["model"] == "ZSCLIP"
    assert h["arch"] == "ViT-T/8@32" and h["n_classes"] == 3
    code, c = _get(url + "/classes")
    assert code == 200 and c["classes"] == NAMES


def test_predict_json_matches_predictor(served):
    pred, url = served
    streams = _streams(np.random.default_rng(3), 5)  # forces a padded chunk
    body = json.dumps({
        "streams": [s.tolist() for s in streams],
        "top_k": 2, "return_probs": True,
    }).encode()
    code, resp = _post(url + "/predict", body)
    assert code == 200
    direct = pred.predict(streams, top_k=2)
    assert resp["label"] == direct["label"].tolist()
    assert resp["names"] == direct["names"]
    assert resp["topk"] == direct["topk"].tolist()
    np.testing.assert_allclose(np.asarray(resp["probs"]), direct["probs"],
                               rtol=1e-5, atol=1e-6)


def test_predict_npz_matches_json(served):
    pred, url = served
    streams = _streams(np.random.default_rng(7), 3)
    buf = io.BytesIO()
    np.savez(buf, **{f"s{i}": s for i, s in enumerate(streams)})
    code, resp = _post(url + "/predict?top_k=2", buf.getvalue(),
                       ctype="application/x-npz")
    assert code == 200
    direct = pred.predict(streams, top_k=2)
    assert resp["label"] == direct["label"].tolist()
    assert resp["topk"] == direct["topk"].tolist()
    assert "probs" not in resp  # not requested


def test_probs_omitted_by_default(served):
    _, url = served
    streams = _streams(np.random.default_rng(9), 1)
    body = json.dumps({"streams": [s.tolist() for s in streams]}).encode()
    code, resp = _post(url + "/predict", body)
    assert code == 200 and "probs" not in resp
    assert len(resp["label"]) == 1 and len(resp["topk"][0]) == 1


def test_bad_requests(served):
    _, url = served
    # malformed JSON
    code, e = _post_err(url + "/predict", b"{not json")
    assert code == 400 and "JSON" in e["error"]
    # missing key
    code, e = _post_err(url + "/predict", json.dumps({"x": 1}).encode())
    assert code == 400 and "streams" in e["error"]
    # empty stream inside a batch: 400 names the offending index
    good = _streams(np.random.default_rng(1), 1)[0]
    body = json.dumps(
        {"streams": [good.tolist(), []]}).encode()
    code, e = _post_err(url + "/predict", body)
    assert code == 400 and "event_streams[1]" in e["error"]
    # bad npz
    code, e = _post_err(url + "/predict", b"\x00\x01",
                        ctype="application/x-npz")
    assert code == 400 and "npz" in e["error"]
    # unknown route
    try:
        _get(url + "/nope")
        raise AssertionError("expected 404")
    except urllib.error.HTTPError as err:
        assert err.code == 404
    # empty body
    code, e = _post_err(url + "/predict", b"")
    assert code == 400


def test_body_size_limit():
    pred = Predictor(_TinyZS(), class_names=NAMES, smoke=True, batch_size=4)
    server = make_server(pred, "127.0.0.1", 0, max_body=64)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        body = json.dumps({"streams": [[[0, 0, 0.0, 1]] * 100]}).encode()
        code, e = _post_err(url + "/predict", body)
        assert code == 413
    finally:
        server.shutdown()


@pytest.fixture(scope="module")
def batched_served():
    pred = Predictor(_TinyZS(), class_names=NAMES, smoke=True, batch_size=4)
    server = make_server(pred, "127.0.0.1", 0, microbatch_ms=25.0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    yield pred, url, server
    server.shutdown()


def test_microbatch_fuses_and_matches_direct(batched_served):
    pred, url, server = batched_served
    streams = _streams(np.random.default_rng(11), 6)
    direct = [pred.predict([s], top_k=2) for s in streams]

    # count device-phase calls to prove fusion actually happens
    calls = []
    inner = pred.predict_windows
    pred.predict_windows = lambda *a, **kw: (calls.append(1),
                                             inner(*a, **kw))[1]
    try:
        results = [None] * len(streams)

        def fire(i):
            body = json.dumps({"streams": [streams[i].tolist()],
                               "top_k": 2}).encode()
            results[i] = _post(url + "/predict", body)

        threads = [threading.Thread(target=fire, args=(i,))
                   for i in range(len(streams))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        pred.predict_windows = inner

    for i, (code, resp) in enumerate(results):
        assert code == 200
        assert resp["label"] == direct[i]["label"].tolist()
        assert resp["names"] == direct[i]["names"]
        assert resp["topk"] == direct[i]["topk"].tolist()
    # 6 concurrent requests within a 25 ms window must not take 6 forwards
    assert len(calls) < len(streams)


def test_microbatch_bad_stream_fails_only_its_request(batched_served):
    _, url, _ = batched_served
    good = _streams(np.random.default_rng(13), 1)[0]
    ok = {}
    bad = {}

    def fire_ok():
        body = json.dumps({"streams": [good.tolist()]}).encode()
        ok["resp"] = _post(url + "/predict", body)

    def fire_bad():
        body = json.dumps({"streams": [[]]}).encode()
        bad["resp"] = _post_err(url + "/predict", body)

    threads = [threading.Thread(target=fire_ok),
               threading.Thread(target=fire_bad)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert ok["resp"][0] == 200 and len(ok["resp"][1]["label"]) == 1
    assert bad["resp"][0] == 400
    assert "event_streams[0]" in bad["resp"][1]["error"]


def test_microbatcher_direct_api():
    from eventclip_tpu.server import MicroBatcher

    pred = Predictor(_TinyZS(), class_names=NAMES, smoke=True, batch_size=4)
    mb = MicroBatcher(pred, max_wait_ms=5.0)
    try:
        streams = _streams(np.random.default_rng(17), 3)
        out = mb.submit(streams, top_k=2)
        direct = pred.predict(streams, top_k=2)
        np.testing.assert_array_equal(out["label"], direct["label"])
        np.testing.assert_allclose(out["probs"], direct["probs"],
                                   rtol=1e-5, atol=1e-6)
        assert out["topk"].shape == (3, 2)
        # empty request short-circuits
        empty = mb.submit([], top_k=1)
        assert empty["probs"].shape == (0, 3)
        with pytest.raises(ValueError, match=r"event_streams\[1\]"):
            mb.submit([streams[0], np.zeros((0, 4), np.float32)])
    finally:
        mb.close()
    with pytest.raises(RuntimeError):
        mb.submit(streams)


def test_resolve_class_names_file(tmp_path):
    f = tmp_path / "names.txt"
    f.write_text("airplanes\nant\n\nbrain\n")
    assert resolve_class_names(_TinyZS(), classes_file=str(f)) == NAMES
    (tmp_path / "empty.txt").write_text("\n")
    with pytest.raises(ValueError, match="no class names"):
        resolve_class_names(_TinyZS(),
                            classes_file=str(tmp_path / "empty.txt"))
    with pytest.raises(ValueError, match="--classes"):
        resolve_class_names(_TinyZS())


def test_resolve_class_names_data_root(tmp_path):
    import eventclip_tpu.data.datasets as ds

    root = tmp_path / "tree"
    for split in ("training", "testing"):
        for cls in ("ant", "brain"):
            d = root / split / cls
            d.mkdir(parents=True)
            ev = np.stack([
                np.random.default_rng(0).integers(0, 240, 50),
                np.random.default_rng(1).integers(0, 180, 50),
                np.sort(np.random.default_rng(2).uniform(0, 0.3, 50)),
                np.random.default_rng(3).choice([-1.0, 1.0], 50),
            ], axis=1).astype(np.float32)
            np.save(d / "a.npy", ev)
    params = _TinyZS()
    names = resolve_class_names(params, data_root=str(root))
    assert names == ["ant", "brain"]
    assert params.data_root == str(root)


def test_unexpected_predictor_error_returns_500(served):
    pred, url = served
    streams = _streams(np.random.default_rng(23), 1)
    body = json.dumps({"streams": [s.tolist() for s in streams]}).encode()
    inner = pred.predict

    def boom(*a, **kw):
        raise RuntimeError("device fell over")

    pred.predict = boom
    try:
        code, e = _post_err(url + "/predict", body)
    finally:
        pred.predict = inner
    assert code == 500 and "device fell over" in e["error"]
    # server still alive afterwards
    code, resp = _post(url + "/predict", body)
    assert code == 200 and len(resp["label"]) == 1


def test_microbatcher_adaptive_gap_lone_request_fast():
    from eventclip_tpu.server import MicroBatcher

    import time

    pred = Predictor(_TinyZS(), class_names=NAMES, smoke=True, batch_size=4)
    s = _streams(np.random.default_rng(29), 1)
    pred.predict(s)  # compile/warm the shared programs first
    # cap is 30 s; the adaptive idle gap must close a lone request's batch
    # after ~50 ms of quiet, never the cap
    mb = MicroBatcher(pred, max_wait_ms=30_000.0, idle_gap_ms=50.0)
    try:
        t0 = time.monotonic()
        out = mb.submit(s)
        dt = time.monotonic() - t0
        assert len(out["label"]) == 1
        assert dt < 10.0, f"lone request waited {dt:.1f}s (cap leak)"
    finally:
        mb.close()


def test_microbatcher_fuses_staggered_burst_into_one_call():
    # Round-3 regression: the gap clock ran on windowing COMPLETIONS, so
    # a burst whose host windowing staggered >idle_gap fired a 1-row
    # batch (one full padded forward) and serialized the rest behind it
    # (canonical bench: 11.2 streams/s, below the no-batching floor).
    # Registrations must hold the batch open while peers still window.
    import time

    from eventclip_tpu.server import MicroBatcher

    pred = Predictor(_TinyZS(), class_names=NAMES, smoke=True, batch_size=8)
    streams = _streams(np.random.default_rng(41), 8)
    pred.predict(streams)  # compile/warm

    calls = []
    inner = pred.gather_windows

    def slow_gather(evs):  # stagger completions well past the idle gap
        out = inner(evs)
        time.sleep(0.03)
        return out

    def spy_predict_windows(wins, valids, **kw):
        calls.append(len(wins))
        return Predictor.predict_windows(pred, wins, valids, **kw)

    pred.gather_windows = slow_gather
    pred.predict_windows = spy_predict_windows
    mb = MicroBatcher(pred, max_wait_ms=5_000.0, idle_gap_ms=10.0)
    try:
        ts = [threading.Thread(target=mb.submit, args=([s],))
              for s in streams]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
    finally:
        mb.close()
        pred.gather_windows = inner
        del pred.predict_windows
    assert calls == [8], (
        f"burst split into batches of {calls} rows instead of one fused 8")
    # phase attribution (bench.py reads this to explain fused-vs-batched
    # residuals): one fused batch -> one log entry whose host-windowing
    # span covers the staggered 30 ms gathers
    assert len(mb.batch_log) == 1
    entry = mb.batch_log[0]
    assert entry["requests"] == 8 and entry["streams"] == 8
    assert entry["window_ms"] >= 25.0
    assert entry["device_ms"] > 0.0
    for k in ("close_ms", "lock_ms", "slice_ms"):
        assert entry[k] >= 0.0, (k, entry)


def test_microbatcher_cap_rearms_while_windowing_progresses():
    # Round-5 regression, caught by the phase instrumentation on a
    # canonical bench run: a 32-burst whose GIL-serialized windowing
    # outlasted the fixed 100 ms cap closed a 27-stream batch at the
    # deadline and paid a second full padded forward for the leftovers
    # (53.8 vs 84+ streams/s). Ready flips are progress: each one must
    # re-arm the cap, so the whole burst fuses as long as no single
    # request stalls longer than max_wait.
    import time

    from eventclip_tpu.server import MicroBatcher

    pred = Predictor(_TinyZS(), class_names=NAMES, smoke=True, batch_size=4)
    streams = _streams(np.random.default_rng(47), 4)
    pred.predict(streams)  # warm
    inner = pred.gather_windows
    idx = {id(s): i for i, s in enumerate(streams)}

    def staggered_gather(evs):
        # flips land ~70 ms apart: every gap is UNDER the 100 ms cap but
        # the burst's total windowing span (~210 ms) is far past it
        time.sleep(0.07 * idx[id(evs[0])])
        return inner(evs)

    calls = []

    def spy_predict_windows(wins, valids, **kw):
        calls.append(len(wins))
        return Predictor.predict_windows(pred, wins, valids, **kw)

    pred.gather_windows = staggered_gather
    pred.predict_windows = spy_predict_windows
    mb = MicroBatcher(pred, max_wait_ms=100.0, idle_gap_ms=10.0)
    try:
        ts = [threading.Thread(target=mb.submit, args=([s],))
              for s in streams]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
    finally:
        mb.close()
        pred.gather_windows = inner
        del pred.predict_windows
    assert calls == [4], (
        f"staggered burst split into batches of {calls} rows — the cap "
        f"must re-arm on ready flips while peers still window")


def test_microbatcher_hard_cap_leaves_stragglers_for_next_batch():
    # at max_wait the worker must run the READY requests rather than
    # wait forever on a still-windowing straggler — and the straggler
    # must still be served by a later batch, not dropped
    import time

    from eventclip_tpu.server import MicroBatcher

    pred = Predictor(_TinyZS(), class_names=NAMES, smoke=True, batch_size=4)
    streams = _streams(np.random.default_rng(43), 3)
    pred.predict(streams)  # warm
    inner = pred.gather_windows
    release = threading.Event()

    def gated_gather(evs):
        out = inner(evs)
        if len(evs) == 1 and evs[0] is streams[2]:
            release.wait(timeout=30)  # the straggler
        return out

    pred.gather_windows = gated_gather
    mb = MicroBatcher(pred, max_wait_ms=100.0, idle_gap_ms=20.0)
    results = {}

    def go(i):
        results[i] = mb.submit([streams[i]])

    try:
        ts = [threading.Thread(target=go, args=(i,)) for i in range(3)]
        for t in ts:
            t.start()
        time.sleep(0.5)  # past the cap: 0 and 1 must already be done
        assert 0 in results and 1 in results and 2 not in results
        release.set()
        for t in ts:
            t.join(timeout=30)
    finally:
        release.set()
        mb.close()
        pred.gather_windows = inner
    direct = pred.predict([streams[2]])
    np.testing.assert_allclose(results[2]["probs"], direct["probs"],
                               rtol=1e-5, atol=1e-6)


def test_npz_positional_keys_preserve_request_order(served):
    # np.savez(buf, *streams) names arrays arr_0..arr_11; sorted() would
    # scramble arr_10 before arr_2 — the decode must use archive order
    pred, url = served
    streams = _streams(np.random.default_rng(31), 12)
    buf = io.BytesIO()
    np.savez(buf, *streams)
    code, resp = _post(url + "/predict", buf.getvalue(),
                       ctype="application/x-npz")
    assert code == 200
    direct = pred.predict(streams)
    assert resp["label"] == direct["label"].tolist()


def test_bad_top_k_returns_400(served):
    _, url = served
    s = _streams(np.random.default_rng(37), 1)[0]
    code, e = _post_err(url + "/predict?top_k=abc",
                        json.dumps({"streams": [s.tolist()]}).encode())
    assert code == 400 and "top_k" in e["error"]
    code, e = _post_err(
        url + "/predict",
        json.dumps({"streams": [s.tolist()], "top_k": None}).encode())
    assert code == 400 and "top_k" in e["error"]
    # str(False) query spelling must NOT enable probs
    code, resp = _post(url + "/predict?return_probs=False",
                       json.dumps({"streams": [s.tolist()]}).encode())
    assert code == 200 and "probs" not in resp


def test_serving_client(served):
    from eventclip_tpu.client import ServingClient, ServingError

    pred, url = served
    c = ServingClient(url)
    assert c.health()["status"] == "ok"
    assert c.classes() == NAMES
    streams = _streams(np.random.default_rng(41), 5)
    out = c.predict(streams, top_k=2, return_probs=True)
    direct = pred.predict(streams, top_k=2)
    np.testing.assert_array_equal(out["label"], direct["label"])
    assert out["names"] == direct["names"]
    np.testing.assert_array_equal(out["topk"], direct["topk"])
    np.testing.assert_allclose(out["probs"], direct["probs"],
                               rtol=1e-5, atol=1e-6)
    out = c.predict(streams[:1])
    assert "probs" not in out and out["label"].shape == (1,)
    # server-side validation surfaces as ServingError with the index
    with pytest.raises(ServingError, match=r"event_streams\[1\]"):
        c.predict([streams[0], np.zeros((0, 4), np.float32)])


def test_warm_up_exercises_every_bucket(monkeypatch):
    import eventclip_tpu.data.loader as loader
    from eventclip_tpu.server import _warm_up

    # batch 16 x 2 views -> buckets {8, 16, 24, 32} (align 8)
    pred = Predictor(_TinyZS(), class_names=NAMES, smoke=True,
                     batch_size=16)
    assert len(pred._buckets) > 1, "geometry must yield multiple buckets"
    seen = []
    orig = loader.pack_view_batch

    def spy(batch, buckets):
        out = orig(batch, buckets)
        if "view_src" in out:
            seen.append(int(out["windows"].shape[0]))
        return out

    monkeypatch.setattr(loader, "pack_view_batch", spy)
    _warm_up(pred)
    assert set(seen) == set(pred._buckets), (seen, pred._buckets)


def test_statz_counters(served):
    from eventclip_tpu.client import ServingClient, ServingError

    _, url = served
    c = ServingClient(url)
    before = c.stats()
    streams = _streams(np.random.default_rng(43), 3)
    c.predict(streams)
    with pytest.raises(ServingError):
        c.predict([np.zeros((0, 4), np.float32)])
    after = c.stats()
    assert after["predict_requests"] == before["predict_requests"] + 1
    assert after["streams"] == before["streams"] + 3
    assert after["errors"] == before["errors"] + 1
    lat = after["latency_ms"]
    assert lat["window"] >= 1 and lat["p50"] <= lat["p95"] <= lat["max"]


def test_microbatcher_with_data_parallel_predictor():
    """Fused device batches must also work when the predictor shards each
    compiled batch over the local device mesh (data_parallel=True) — the
    production multi-chip serving layout."""
    from eventclip_tpu.server import MicroBatcher

    pred = Predictor(_TinyZS(), class_names=NAMES, smoke=True,
                     batch_size=8, data_parallel=True)
    streams = _streams(np.random.default_rng(47), 6)
    direct = pred.predict(streams, top_k=2)
    mb = MicroBatcher(pred, max_wait_ms=200.0, idle_gap_ms=50.0)
    try:
        results = [None] * len(streams)

        def fire(i):
            results[i] = mb.submit([streams[i]], top_k=2)

        ts = [threading.Thread(target=fire, args=(i,))
              for i in range(len(streams))]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
    finally:
        mb.close()
    for i, r in enumerate(results):
        assert r is not None
        np.testing.assert_array_equal(r["label"], direct["label"][i:i + 1])
        np.testing.assert_allclose(r["probs"][0], direct["probs"][i],
                                   rtol=1e-5, atol=1e-6)


def test_auth_token():
    from eventclip_tpu.client import ServingClient, ServingError

    pred = Predictor(_TinyZS(), class_names=NAMES, smoke=True, batch_size=4)
    server = make_server(pred, "127.0.0.1", 0, auth_token="sekrit")
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        with pytest.raises(ServingError) as e:
            ServingClient(url).health()  # no token
        assert e.value.status == 401
        with pytest.raises(ServingError) as e:
            ServingClient(url, auth_token="wrong").health()
        assert e.value.status == 401
        c = ServingClient(url, auth_token="sekrit")
        assert c.health()["status"] == "ok"
        out = c.predict(_streams(np.random.default_rng(53), 2))
        assert out["label"].shape == (2,)
    finally:
        server.shutdown()


def test_batch_inference_cli(tmp_path):
    """python -m eventclip_tpu.serve: folder-of-dumps batch inference
    writes aligned JSONL without a dataset tree."""
    import subprocess
    import sys

    rng = np.random.default_rng(59)
    streams = _streams(rng, 5)
    for i, s in enumerate(streams):
        np.save(tmp_path / f"dump_{i}.npy", s)
    cfg = tmp_path / "cfg.py"
    cfg.write_text(
        "from eventclip_tpu.utils.config import Params\n\n\n"
        "class EventCLIPParams(Params):\n"
        "    gpus = 1\n"
        "    dataset = 'n_caltech'\n"
        "    data_root = '/nonexistent'\n"
        "    train_batch_size = 4\n"
        "    val_batch_size = 8\n"
        "    quantize_args = dict(max_imgs=2, N=1000,"
        " split_method='event_count', convert_method='event_histogram',"
        " grayscale=True, count_non_zero=False, background_mask=True)\n"
        "    model = 'ZSCLIP'\n"
        "    clip_dict = dict(arch='ViT-T/8@32',"
        " prompt='a point cloud image of a {}', agg_func='mean')\n"
        "    bf16 = False\n")
    names = tmp_path / "names.txt"
    names.write_text("\n".join(NAMES) + "\n")
    out_path = tmp_path / "preds.jsonl"

    import os
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "eventclip_tpu.serve",
         "--params", str(cfg), "--classes", str(names),
         "--inputs", str(tmp_path / "*.npy"), "--out", str(out_path),
         "--smoke", "--cpu", "--batch_size", "4", "--top_k", "2"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    recs = [json.loads(ln) for ln in out_path.read_text().splitlines()]
    assert len(recs) == 5
    assert [r_["path"] for r_ in recs] == sorted(
        str(tmp_path / f"dump_{i}.npy") for i in range(5))
    for rec in recs:
        assert rec["name"] in NAMES and len(rec["topk"]) == 2
        assert rec["topk_names"][0] == rec["name"]
        assert "probs" not in rec


def test_microbatcher_with_tta_predictor():
    """TTA rows (4 per stream) fuse across requests; per-request slicing
    goes by stream count, not device rows."""
    from eventclip_tpu.server import MicroBatcher

    pred = Predictor(_TinyZS(), class_names=NAMES, smoke=True,
                     batch_size=4, tta=True)
    streams = _streams(np.random.default_rng(67), 4)
    direct = pred.predict(streams, top_k=2)
    mb = MicroBatcher(pred, max_wait_ms=200.0, idle_gap_ms=50.0)
    try:
        results = [None] * len(streams)

        def fire(i):
            results[i] = mb.submit([streams[i]], top_k=2)

        ts = [threading.Thread(target=fire, args=(i,))
              for i in range(len(streams))]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
    finally:
        mb.close()
    for i, r in enumerate(results):
        np.testing.assert_allclose(r["probs"][0], direct["probs"][i],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(r["label"], direct["label"][i:i + 1])


def test_load_event_file_structured_npz(tmp_path):
    from eventclip_tpu.serve import load_event_file

    n = 500
    rng = np.random.default_rng(71)
    ev = np.zeros(n, dtype=[("x", "<u2"), ("y", "<u2"), ("t", "<i8"),
                            ("p", "?")])
    ev["x"] = rng.integers(0, 640, n)
    ev["y"] = rng.integers(0, 480, n)
    ev["t"] = np.sort(rng.integers(0, 55_000, n))  # microseconds
    ev["p"] = rng.random(n) < 0.5
    np.savez(tmp_path / "dump.npz", event_data=ev)
    out = load_event_file(str(tmp_path / "dump.npz"))
    assert out.shape == (n, 4) and out.dtype == np.float32
    assert out[:, 2].max() < 0.06  # microseconds -> seconds
    assert set(np.unique(out[:, 3])) <= {-1.0, 1.0}  # 0/1 -> +-1


def test_load_event_file_plain_npz(tmp_path):
    # np.savez of a single [n, 4] array under an arbitrary key must load
    from eventclip_tpu.serve import load_event_file

    rng = np.random.default_rng(72)
    ev = np.stack([
        rng.integers(0, 240, 300), rng.integers(0, 180, 300),
        np.sort(rng.random(300)), rng.choice([-1.0, 1.0], 300),
    ], axis=1)
    np.savez(tmp_path / "plain.npz", ev)
    out = load_event_file(str(tmp_path / "plain.npz"))
    assert out.shape == (300, 4) and out.dtype == np.float32
    np.testing.assert_allclose(out, ev.astype(np.float32))


def test_load_event_file_bad_npz_raises_with_layout(tmp_path):
    # unrecognized layout: a ValueError naming the keys, not a KeyError
    from eventclip_tpu.serve import load_event_file

    np.savez(tmp_path / "bad.npz", a=np.zeros((3, 3)), b=np.zeros(2))
    with pytest.raises(ValueError, match="unrecognized npz layout"):
        load_event_file(str(tmp_path / "bad.npz"))


def test_warm_up_covers_buckets_with_tta_odd_batch(monkeypatch):
    # batch_size % 4 != 0 with TTA: warming through predict() could never
    # reach the top bucket (streams expand to 4 rows each); warm_up crafts
    # device chunks directly, so coverage is exact for any combination
    import eventclip_tpu.data.loader as loader
    from eventclip_tpu.server import _warm_up

    pred = Predictor(_TinyZS(), class_names=NAMES, smoke=True,
                     batch_size=6, tta=True)
    assert len(pred._buckets) > 1, "geometry must yield multiple buckets"
    seen = []
    orig = loader.pack_view_batch

    def spy(batch, buckets):
        out = orig(batch, buckets)
        if "view_src" in out:
            seen.append(int(out["windows"].shape[0]))
        return out

    monkeypatch.setattr(loader, "pack_view_batch", spy)
    _warm_up(pred)
    assert set(seen) == set(pred._buckets), (seen, pred._buckets)


def test_microbatcher_default_cap_counts_streams():
    # the collect cap is documented in STREAMS; under TTA each stream
    # spans 4 device rows, so the default derives from the row budget
    from eventclip_tpu.server import MicroBatcher

    pred = Predictor(_TinyZS(), class_names=NAMES, smoke=True,
                     batch_size=8, tta=True)
    mb = MicroBatcher(pred, max_wait_ms=1.0)
    try:
        assert mb._max == 2 * 8  # 8 chunks x (8 rows / 4 rows-per-stream)
    finally:
        mb.close()


def test_drain_waits_for_inflight_request():
    # SIGTERM contract: drain must hold process exit until the in-flight
    # request's response is written (handler threads are daemons)
    import time as _time

    from eventclip_tpu.client import ServingClient

    pred = Predictor(_TinyZS(), class_names=NAMES, smoke=True, batch_size=4)
    inner = pred.predict

    def slow_predict(streams, top_k=1):
        _time.sleep(0.8)
        return inner(streams, top_k=top_k)

    pred.predict = slow_predict
    server = make_server(pred, "127.0.0.1", 0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    rng = np.random.default_rng(73)
    result = {}

    def fire():
        result["out"] = ServingClient(url).predict(_streams(rng, 1))

    rt = threading.Thread(target=fire)
    rt.start()
    _time.sleep(0.3)  # request is now inside slow_predict
    t0 = _time.monotonic()
    assert server.drain() is True
    waited = _time.monotonic() - t0
    rt.join(10)
    assert "out" in result, "client response lost during drain"
    assert waited >= 0.2, "drain returned before the in-flight request"
    server.server_close()


def test_make_server_plumbs_idle_gap():
    pred = Predictor(_TinyZS(), class_names=NAMES, smoke=True, batch_size=4)
    server = make_server(pred, "127.0.0.1", 0, microbatch_ms=50.0,
                         microbatch_idle_ms=5.0)
    try:
        assert server.batcher is not None
        assert abs(server.batcher._wait - 0.050) < 1e-9
        assert abs(server.batcher._gap - 0.005) < 1e-9
    finally:
        server.batcher.close()
        server.server_close()


def test_embed_route_matches_predictor():
    from eventclip_tpu.client import ServingClient

    pred = Predictor(_TinyZS(), class_names=NAMES, smoke=True,
                     batch_size=4, embed=True)
    server = make_server(pred, "127.0.0.1", 0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{server.server_address[1]}"
        rng = np.random.default_rng(74)
        streams = _streams(rng, 3)
        got = ServingClient(url).embed(streams)
        want = pred.embed(streams)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    finally:
        server.shutdown()
        server.server_close()


def test_embed_route_disabled_is_400(served):
    from eventclip_tpu.client import ServingClient, ServingError

    _, url = served
    rng = np.random.default_rng(75)
    with pytest.raises(ServingError, match="--embed"):
        ServingClient(url).embed(_streams(rng, 1))


def test_batch_inference_cli_embed_out(tmp_path):
    """--embed_out switches the offline CLI to embedding-index extraction:
    one npz with aligned paths + L2-normalized feature rows."""
    import os
    import subprocess
    import sys

    rng = np.random.default_rng(76)
    streams = _streams(rng, 5)
    for i, s in enumerate(streams):
        np.save(tmp_path / f"dump_{i}.npy", s)
    cfg = tmp_path / "cfg.py"
    cfg.write_text(
        "from eventclip_tpu.utils.config import Params\n\n\n"
        "class EventCLIPParams(Params):\n"
        "    gpus = 1\n"
        "    dataset = 'n_caltech'\n"
        "    data_root = '/nonexistent'\n"
        "    train_batch_size = 4\n"
        "    val_batch_size = 8\n"
        "    quantize_args = dict(max_imgs=2, N=1000,"
        " split_method='event_count', convert_method='event_histogram',"
        " grayscale=True, count_non_zero=False, background_mask=True)\n"
        "    model = 'ZSCLIP'\n"
        "    clip_dict = dict(arch='ViT-T/8@32',"
        " prompt='a point cloud image of a {}', agg_func='mean')\n"
        "    bf16 = False\n")
    names = tmp_path / "names.txt"
    names.write_text("\n".join(NAMES) + "\n")
    idx_path = tmp_path / "index.npz"

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-m", "eventclip_tpu.serve",
         "--params", str(cfg), "--classes", str(names),
         "--inputs", str(tmp_path / "*.npy"),
         "--embed_out", str(idx_path),
         "--smoke", "--cpu", "--batch_size", "4"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    with np.load(idx_path) as z:
        paths, feats = list(z["paths"]), z["embeddings"]
    assert paths == sorted(
        str(tmp_path / f"dump_{i}.npy") for i in range(5))
    assert feats.shape[0] == 5 and feats.dtype == np.float32
    np.testing.assert_allclose(np.linalg.norm(feats, axis=-1), 1.0,
                               atol=1e-4)


def test_set_classes_route_swaps_vocabulary():
    from eventclip_tpu.client import ServingClient

    pred = Predictor(_TinyZS(), class_names=NAMES, smoke=True, batch_size=4)
    server = make_server(pred, "127.0.0.1", 0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{server.server_address[1]}"
        c = ServingClient(url)
        assert c.classes() == NAMES
        new = ["cup", "chair", "lamp", "pizza"]
        assert c.set_classes(new) == new
        assert c.classes() == new
        assert c.health()["n_classes"] == 4
        out = c.predict(_streams(np.random.default_rng(77), 1))
        assert out["names"][0] in new
    finally:
        server.shutdown()
        server.server_close()


def test_set_classes_rejected_with_microbatcher():
    from eventclip_tpu.client import ServingClient, ServingError

    pred = Predictor(_TinyZS(), class_names=NAMES, smoke=True, batch_size=4)
    server = make_server(pred, "127.0.0.1", 0, microbatch_ms=20.0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{server.server_address[1]}"
        with pytest.raises(ServingError, match="microbatch"):
            ServingClient(url).set_classes(["x", "y"])
    finally:
        server.shutdown()
        server.server_close()


def test_streaming_session_http(served):
    """The full session lifecycle over HTTP: open, chunked appends (one
    piggybacking a rolling prediction), predict-only, info, close. The
    rolling prediction must equal Predictor.predict on the buffered
    events — the server-side StreamSession routes through the same
    compiled path."""
    from eventclip_tpu.client import ServingClient, ServingError

    pred, url = served
    c = ServingClient(url)
    rng = np.random.default_rng(21)
    stream = _streams(rng, 1)[0]
    chunks = np.array_split(stream, 3)

    with c.open_session() as sess:
        assert sess.horizon == pred.views * pred.window
        r = sess.append(chunks[0])
        assert r == {"n_events": len(chunks[0]), "horizon": sess.horizon}
        sess.append(chunks[1])
        r = sess.append(chunks[2], predict=True, top_k=2)
        assert r["n_events"] == len(stream)
        want = pred.predict([stream], top_k=2)
        assert r["label"] == int(want["label"][0])
        assert r["name"] == want["names"][0]
        np.testing.assert_allclose(r["probs"], want["probs"][0],
                                   rtol=1e-4, atol=1e-5)
        # predict-only route agrees with the piggybacked one
        r2 = sess.predict(top_k=2)
        assert r2["label"] == r["label"] and r2["topk"] == r["topk"]
        assert sess.info() == {"n_events": len(stream),
                               "horizon": sess.horizon}
        sid = sess.session_id
    # context exit closed it
    with pytest.raises(ServingError) as e:
        c._request(f"/session/{sid}")
    assert e.value.status == 404


def test_streaming_session_errors(served):
    from eventclip_tpu.client import ServingClient, ServingError

    _, url = served
    c = ServingClient(url)
    sess = c.open_session(horizon=2000)
    try:
        # empty buffer -> 409, not a crash
        with pytest.raises(ServingError) as e:
            sess.predict()
        assert e.value.status == 409
        # malformed chunk -> 400 with the shape in the message
        with pytest.raises(ServingError) as e:
            sess.append(np.zeros((5, 3), np.float32))
        assert e.value.status == 400 and "x/y/t/p" in e.value.message
        # unknown id -> 404
        with pytest.raises(ServingError) as e:
            c._request("/session/deadbeef/predict", data=b"")
        assert e.value.status == 404
        # bad horizon -> 400
        with pytest.raises(ServingError) as e:
            c.open_session(horizon=1)
        assert e.value.status == 400
    finally:
        sess.close()


def test_streaming_session_hardening(served):
    """Review-fix contracts: the client-requested horizon is capped
    server-side (an unbounded horizon is a memory DoS), an empty JSON
    chunk is a fine quiet-sensor heartbeat (StreamSession's documented
    contract), and a combined append+predict whose prediction fails still
    returns 200 reporting the append plus ``predict_error`` — a client
    retrying an error response must not double-append."""
    from eventclip_tpu.client import ServingClient, ServingError

    pred, url = served
    c = ServingClient(url)
    cap = 16 * pred.views * pred.window
    with pytest.raises(ServingError) as e:
        c.open_session(horizon=cap + 1)
    assert e.value.status == 400 and str(cap) in e.value.message

    sess = c.open_session()
    try:
        r = sess.append(np.empty((0, 4), np.float32))
        assert r["n_events"] == 0
        st, r = _post(f"{url}/session/{sess.session_id}/events",
                      json.dumps({"events": []}).encode())
        assert st == 200 and r["n_events"] == 0

        orig = pred.predict
        def boom(*a, **k):
            raise RuntimeError("injected device failure")
        pred.predict = boom
        try:
            r = sess.append(np.zeros((7, 4), np.float32), predict=True)
        finally:
            pred.predict = orig
        assert r["n_events"] == 7
        assert "injected device failure" in r["predict_error"]
        assert sess.info()["n_events"] == 7  # exactly one copy landed

        # a malformed top_k on the predict-only route is a 400 (bad
        # request), never a 409 (the empty-buffer status)
        with pytest.raises(ServingError) as e:
            c._request(f"/session/{sess.session_id}/predict",
                       data=json.dumps({"top_k": "abc"}).encode())
        assert e.value.status == 400 and "top_k" in e.value.message
    finally:
        sess.close()


def test_streaming_session_ttl_and_cap():
    """Sessions must not leak: idle ones expire after the ttl (404 and
    freed), and the store caps concurrent sessions (429)."""
    import time as _time

    from eventclip_tpu.client import ServingClient, ServingError

    pred = Predictor(_TinyZS(), class_names=NAMES, smoke=True, batch_size=4)
    server = make_server(pred, "127.0.0.1", 0, session_ttl_s=0.2,
                         max_sessions=1)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        c = ServingClient(f"http://127.0.0.1:{server.server_address[1]}")
        sess = c.open_session()
        with pytest.raises(ServingError) as e:
            c.open_session()
        assert e.value.status == 429
        assert c.stats()["sessions"] == 1
        _time.sleep(0.3)
        # expired: appends 404, the slot is free again
        with pytest.raises(ServingError) as e:
            sess.append(np.zeros((4, 4), np.float32))
        assert e.value.status == 404
        sess2 = c.open_session()
        sess2.close()
        assert c.stats()["sessions"] == 0
    finally:
        server.shutdown()


def test_serving_from_exported_bundle(tmp_path):
    """An HTTP server handed an ExportedPredictor (the --from_export path)
    must answer /predict, /classes, and a streaming session exactly like
    the live predictor it was exported from; /set_classes and /embed
    surface the frozen-program refusal as a clean 400, not a 500."""
    from eventclip_tpu.export import ExportedPredictor, export_predictor

    live = Predictor(_TinyZS(), class_names=NAMES, smoke=True, batch_size=4)
    bundle = str(tmp_path / "model.eclip")
    export_predictor(live, bundle)
    frozen = ExportedPredictor(bundle)
    server = make_server(frozen, "127.0.0.1", 0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        code, resp = _get(url + "/classes")
        assert code == 200 and resp["classes"] == NAMES
        streams = _streams(np.random.default_rng(3), 5)
        body = json.dumps({
            "streams": [s.tolist() for s in streams],
            "top_k": 2, "return_probs": True,
        }).encode()
        code, resp = _post(url + "/predict", body)
        assert code == 200
        direct = live.predict(streams, top_k=2)
        assert resp["label"] == direct["label"].tolist()
        assert resp["names"] == direct["names"]
        np.testing.assert_allclose(np.asarray(resp["probs"]),
                                   direct["probs"], rtol=1e-5, atol=1e-6)
        # frozen programs can't swap labels or embed: clean client errors
        for route, payload in (
            ("/set_classes", {"classes": ["a", "b"]}),
            ("/embed", {"streams": [streams[0].tolist()]}),
        ):
            with pytest.raises(urllib.error.HTTPError) as e:
                _post(url + route, json.dumps(payload).encode())
            assert e.value.code == 400, (
                f"{route}: frozen-bundle refusal should be a client error")
    finally:
        server.shutdown()


def test_serving_from_exported_bundle_swaps_vocabulary(tmp_path,
                                                       monkeypatch):
    """A bundle built where a BPE vocab exists carries the frozen text
    tower: /set_classes works on the deployed server for same-count
    swaps (the open-vocabulary serving claim survives export); a count
    change is still a clean 400."""
    from eventclip_tpu.client import ServingClient, ServingError
    from eventclip_tpu.export import ExportedPredictor, export_predictor
    from tests.test_export import _write_vocab

    monkeypatch.setenv("EVENTCLIP_BPE_PATH", _write_vocab(tmp_path))
    live = Predictor(_TinyZS(), class_names=NAMES, smoke=True, batch_size=4)
    bundle = str(tmp_path / "model.eclip")
    export_predictor(live, bundle)
    server = make_server(ExportedPredictor(bundle), "127.0.0.1", 0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{server.server_address[1]}"
        c = ServingClient(url)
        new = ["cup", "chair", "lamp"]  # same count as NAMES
        assert c.set_classes(new) == new
        assert c.classes() == new
        out = c.predict(_streams(np.random.default_rng(78), 1))
        assert out["names"][0] in new
        with pytest.raises(ServingError, match="same count"):
            c.set_classes(["just", "two"])
    finally:
        server.shutdown()
        server.server_close()
