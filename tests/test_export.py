"""AOT serving bundles (eventclip_tpu.export): a bundle written by
export_predictor must reproduce the live Predictor's predictions with no
model-building code at load time."""

import json
import zipfile

import numpy as np
import pytest

from eventclip_tpu.export import ExportedPredictor, export_predictor
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


NAMES = ["airplanes", "ant", "brain"]


def _streams(rng, n=5):
    out = []
    for _ in range(n):
        k = 1500 + int(rng.integers(0, 2000))
        out.append(np.stack([
            rng.integers(0, 240, k),
            rng.integers(0, 180, k),
            np.sort(rng.uniform(0, 0.3, k)),
            rng.choice([-1.0, 1.0], k),
        ], axis=1))
    return out


@pytest.fixture(scope="module")
def live():
    return Predictor(_TinyZS(), class_names=NAMES, smoke=True, batch_size=4)


@pytest.fixture(scope="module")
def bundle(live, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("export") / "model.eclip")
    meta = export_predictor(live, path)
    return path, meta


def test_bundle_layout(bundle, live):
    path, meta = bundle

    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
        stored = json.loads(z.read("meta.json").decode("utf-8"))
    # weights once (params.npz) + the padded program + one frozen packed
    # program per view-pack bucket — the SAME bucket policy the exporting
    # predictor resolved (asserting against live._buckets rather than
    # recomputing eval_pack_buckets keeps this true even when
    # EVENTCLIP_NO_PACK_EVAL is set in the outer environment)
    buckets = list(live._buckets or [])
    assert stored["buckets"] == buckets
    expected = ({"meta.json", "params.npz", "step.jaxexport"}
                | {f"packed_{k}.jaxexport" for k in buckets})
    # the text program + BPE vocab ride along exactly when the build host
    # had a vocab asset to ship (meta records why otherwise)
    if "skip" in stored["text"]:
        assert names == expected
        assert "vocab" in stored["text"]["skip"]
    else:
        assert names == expected | {"text.jaxexport", "bpe_vocab.bin"}
        assert stored["text"]["n_cls"] == len(NAMES)
    assert stored["embed"] is False
    assert stored == meta
    assert stored["class_names"] == NAMES
    assert stored["batch_size"] == 4
    assert stored["window"] == 1000
    assert stored["tta"] is False
    assert len(stored["params_manifest"]) > 0
    assert "cpu" in stored["platforms"]


def test_packed_program_serves_small_requests(bundle):
    """The bundle carries the view-packed bucket programs, so a short
    request is served by a packed program — not by padding out the whole
    batch_size x views budget. Proof: break the padded program and watch
    a one-stream request still answer."""
    frozen = ExportedPredictor(bundle[0])
    assert frozen._buckets == bundle[1]["buckets"]

    def boom(*a, **k):
        raise AssertionError("padded program dispatched for a packable "
                             "request")

    frozen._step = boom
    out = frozen.predict(_streams(np.random.default_rng(3), n=1))
    assert out["probs"].shape == (1, len(NAMES))
    np.testing.assert_allclose(out["probs"].sum(axis=-1), 1.0, rtol=1e-4)


def test_exported_matches_live(live, bundle):
    """The frozen program must reproduce the live predictions — same
    streams, same chunking, including a padded tail chunk and a stream
    long enough to force content-seeded view subsampling."""
    frozen = ExportedPredictor(bundle[0])
    rng = np.random.default_rng(7)
    streams = _streams(rng, n=5)  # 5 streams, bs=4: padded second chunk
    k = 14000  # > views * N: the subsample path
    streams[1] = np.stack([
        rng.integers(0, 240, k), rng.integers(0, 180, k),
        np.sort(rng.uniform(0, 0.3, k)), rng.choice([-1.0, 1.0], k),
    ], axis=1)
    a = live.predict(streams, top_k=2)
    b = frozen.predict(streams, top_k=2)
    # both sides route the same bucket policy (padded + packed programs
    # are all frozen) — identical math modulo float reduction order
    np.testing.assert_allclose(a["probs"], b["probs"], rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(a["label"], b["label"])
    assert a["names"] == b["names"]
    np.testing.assert_array_equal(a["topk"], b["topk"])


def test_exported_host_contract(bundle):
    frozen = ExportedPredictor(bundle[0])
    # inherited validation: bad stream is named by index
    with pytest.raises(ValueError, match=r"event_streams\[1\]"):
        frozen.predict([np.zeros((10, 4), np.float32),
                        np.zeros((0, 4), np.float32)])
    # empty request short-circuits without the device
    out = frozen.predict([])
    assert out["probs"].shape == (0, 3) and out["names"] == []
    # frozen programs can't swap labels or embed
    with pytest.raises(ValueError, match="re-export"):
        frozen.set_classes(["a", "b"])
    with pytest.raises(RuntimeError, match="live Predictor"):
        frozen.embed([np.zeros((10, 4), np.float32)])


def test_exported_tta_bundle(tmp_path):
    """TTA predictors export too: 4 variant rows per stream, averaged by
    the inherited finalize — bit-identical to the live TTA predictor."""
    live = Predictor(_TinyZS(), class_names=NAMES, smoke=True,
                     batch_size=4, tta=True)
    path = str(tmp_path / "tta.eclip")
    meta = export_predictor(live, path)
    assert meta["tta"] is True
    frozen = ExportedPredictor(path)
    streams = _streams(np.random.default_rng(8), n=2)
    a = live.predict(streams)
    b = frozen.predict(streams)
    np.testing.assert_allclose(a["probs"], b["probs"], rtol=1e-5, atol=1e-6)


def test_exported_int8_bundle(tmp_path):
    """Quantized trees (int8 payload + f32 scales) bake into the program
    and reproduce the live int8 predictions."""
    live = Predictor(_TinyZS(), class_names=NAMES, smoke=True,
                     batch_size=4, int8=True)
    path = str(tmp_path / "int8.eclip")
    export_predictor(live, path)
    frozen = ExportedPredictor(path)
    streams = _streams(np.random.default_rng(9), n=3)
    a = live.predict(streams)
    b = frozen.predict(streams)
    np.testing.assert_allclose(a["probs"], b["probs"], rtol=1e-5, atol=1e-6)


def test_format_version_gate(bundle, tmp_path):
    path = str(tmp_path / "future.eclip")
    with zipfile.ZipFile(bundle[0]) as src, \
            zipfile.ZipFile(path, "w") as dst:
        meta = json.loads(src.read("meta.json").decode("utf-8"))
        meta["format_version"] = 999
        dst.writestr("meta.json", json.dumps(meta))
        dst.writestr("step.jaxexport", src.read("step.jaxexport"))
    with pytest.raises(ValueError, match="format 999"):
        ExportedPredictor(path)


def test_byteorder_gate(bundle, tmp_path):
    """Weight leaves are raw native-order bytes; a bundle built on an
    opposite-endian host must be rejected at load, not silently viewed."""
    path = str(tmp_path / "wrong_endian.eclip")
    with zipfile.ZipFile(bundle[0]) as src, \
            zipfile.ZipFile(path, "w") as dst:
        for name in src.namelist():
            if name == "meta.json":
                meta = json.loads(src.read(name).decode("utf-8"))
                assert meta["byteorder"] in ("little", "big")
                meta["byteorder"] = ("big" if meta["byteorder"] == "little"
                                     else "little")
                dst.writestr(name, json.dumps(meta))
            else:
                dst.writestr(name, src.read(name))
    with pytest.raises(ValueError, match="endian"):
        ExportedPredictor(path)


def _write_vocab(tmp_path):
    """A tiny-but-real BPE merge table on disk (the synthetic merges the
    tokenizer unit tests exercise), gzip'd like the released asset."""
    import gzip

    from tests.test_tokenizer import MERGES

    path = tmp_path / "bpe_simple_vocab_16e6.txt.gz"
    text = "#version: tiny\n" + "\n".join(f"{a} {b}" for a, b in MERGES)
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write(text)
    return str(path)


def test_offline_set_classes(tmp_path, monkeypatch):
    """With a vocab asset on the build host, the bundle freezes the text
    tower + ships the BPE table, and ExportedPredictor.set_classes
    reproduces the live predictor's runtime label swap — no model code,
    no re-export."""
    monkeypatch.setenv("EVENTCLIP_BPE_PATH", _write_vocab(tmp_path))
    live = Predictor(_TinyZS(), class_names=NAMES, smoke=True, batch_size=4)
    path = str(tmp_path / "swap.eclip")
    meta = export_predictor(live, path)
    assert "skip" not in meta["text"]
    assert meta["text"]["prompt"] == "a point cloud image of a {}"
    frozen = ExportedPredictor(path)
    streams = _streams(np.random.default_rng(21), n=3)

    swapped = ["cat", "point_cloud", "image of everything"]
    live.set_classes(swapped)
    frozen.set_classes(swapped)
    assert frozen.class_names == swapped
    a = live.predict(streams)
    b = frozen.predict(streams)
    np.testing.assert_allclose(a["probs"], b["probs"], rtol=1e-5, atol=1e-6)
    assert a["names"] == b["names"]

    # count changes need a retrace the frozen programs cannot do
    with pytest.raises(ValueError, match="n_cls=3"):
        frozen.set_classes(["just", "two"])
    with pytest.raises(ValueError, match="non-empty"):
        frozen.set_classes([])


def test_exported_embed(tmp_path, monkeypatch):
    """--embed freezes the embeddings program; the bundle's embed()
    matches the live retrieval features."""
    monkeypatch.delenv("EVENTCLIP_BPE_PATH", raising=False)
    live = Predictor(_TinyZS(), class_names=NAMES, smoke=True,
                     batch_size=4, embed=True)
    path = str(tmp_path / "embed.eclip")
    meta = export_predictor(live, path)
    assert meta["embed"] is True
    frozen = ExportedPredictor(path)
    streams = _streams(np.random.default_rng(22), n=3)
    a = live.embed(streams)
    b = frozen.embed(streams)
    assert b.shape == a.shape and b.dtype == np.float32
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(b, axis=-1), 1.0, rtol=1e-4)
    empty = frozen.embed([])
    assert empty.shape == (0, a.shape[-1])


def test_offline_cli_from_export(bundle, live, tmp_path, capsys):
    """python -m eventclip_tpu.serve --from_export: the offline batch CLI
    classifies dumps with the frozen bundle; model flags baked at export
    time are rejected instead of silently ignored."""
    from eventclip_tpu.serve import main as serve_main

    rng = np.random.default_rng(11)
    streams = _streams(rng, 3)
    for i, s in enumerate(streams):
        np.save(tmp_path / f"dump_{i}.npy", s.astype(np.float32))
    out_path = tmp_path / "preds.jsonl"
    serve_main(["--from_export", bundle[0],
                "--inputs", str(tmp_path / "*.npy"),
                "--out", str(out_path), "--top_k", "2"])
    recs = [json.loads(ln) for ln in out_path.read_text().splitlines()]
    assert len(recs) == 3
    direct = live.predict(
        [np.load(tmp_path / f"dump_{i}.npy") for i in range(3)], top_k=2)
    assert [r["name"] for r in recs] == direct["names"]

    with pytest.raises(SystemExit):
        serve_main(["--from_export", bundle[0], "--int8",
                    "--inputs", str(tmp_path / "*.npy")])
    with pytest.raises(SystemExit):  # exactly one source
        serve_main(["--inputs", str(tmp_path / "*.npy")])
