"""AOT serving artifacts: one self-contained file per deployment.

The reference has no deployment story beyond re-running test.py; our live
`serve.Predictor` already packages that pipeline, but it still rebuilds
the model (config import, CLIP construction, checkpoint load, text-tower
prompting) and re-traces the step on every process start. This module
freezes a Predictor's device programs into a single portable bundle via
`jax.export` (StableHLO) so a serving host needs NO model-building code
and NO checkpoint/config files:

    # build box (has config + weights):
    python -m eventclip_tpu.export --params configs/zsclip/... \
        --classes names.txt --out model.eclip

    # serving box (has only the bundle):
    from eventclip_tpu.export import ExportedPredictor
    pred = ExportedPredictor("model.eclip")
    out = pred.predict(list_of_event_arrays)

What the bundle pins, by construction:
- the exact traced computations (rasterize -> preprocess -> CLIP ->
  aggregation) at fixed geometries — no retrace, no config drift between
  build and serving. Both the padded program AND the view-packed bucket
  variants freeze, so bundle serving keeps live serving's small-request
  economy (a one-stream request encodes its ~8 real views, not the whole
  batch_size x views budget);
- the weights (quantized int8 trees included), stored ONCE as raw leaf
  bytes and fed to every program as arguments — freezing the 1-5 bucket
  programs costs kilobytes of StableHLO each, not weight-sized copies;
- the label space, TTA mode, and sensor geometry in a JSON header the
  loader uses to reconstruct the HOST half — `ExportedPredictor`
  subclasses `Predictor`, so windowing/chunking/TTA aggregation and the
  bucket policy are the SAME code as live serving (parity by
  construction, not by re-test).

Portability: by default the export lowers the XLA formulation of every
kernel (the Pallas/Mosaic custom calls carry no cross-version stability
guarantee), so the artifact runs on any JAX backend/version within the
jax.export compatibility window. `pallas=True` keeps the fused TPU
kernels for a same-fleet deployment, at the cost of that guarantee.

Open vocabulary survives deployment: unless the checkpoint prompt-tunes
its text features, the bundle also freezes the TEXT tower program and
ships the BPE vocab, so `ExportedPredictor.set_classes` swaps label sets
offline (same count only — the classification programs bake n_cls into
their logits shapes and a bundle cannot retrace). `--embed` additionally
freezes the embeddings program for retrieval deployments.

Scope: single-device programs (the common serving shape; multi-chip
serving re-shards at load time and should use the live Predictor).
"""

from __future__ import annotations

import json
import os
import sys
import zipfile
from typing import Optional, Sequence

import numpy as np

from .serve import Predictor

_META_NAME = "meta.json"
_STEP_NAME = "step.jaxexport"
_TEXT_NAME = "text.jaxexport"
_EMBED_NAME = "embed.jaxexport"
_BPE_NAME = "bpe_vocab.bin"
_PARAMS_NAME = "params.npz"
_FORMAT_VERSION = 2


def _packed_name(bucket: int) -> str:
    return f"packed_{bucket}.jaxexport"


def _leaf_bytes(x: np.ndarray) -> np.ndarray:
    """A dtype-agnostic byte VIEW (npz can't round-trip bf16 natively);
    no copy for the contiguous arrays device_get returns."""
    return np.ascontiguousarray(x).reshape(-1).view(np.uint8)


def export_predictor(pred: Predictor, path: str, *,
                     platforms: Optional[Sequence[str]] = None,
                     pallas: bool = False) -> dict:
    """Freeze `pred`'s device programs + weights into `path`.

    platforms: lowering platforms (e.g. ("cpu", "tpu") for an artifact
        that runs on both); default = the current backend.
    pallas: keep Mosaic kernels in the artifact (TPU-only, waives the
        custom-call stability guarantee). Default lowers the XLA
        formulations — same numerics, portable.

    Returns the metadata dict written into the bundle. The weights are
    serialized once as raw leaf bytes and every frozen program takes them
    as arguments, so the file is roughly the model size (~1.7 GB for
    ViT-L/14 fp32 masters; int8 towers shrink it) regardless of how many
    bucket programs freeze.
    """
    import jax
    from jax import export as jexport

    if pred._mesh is not None:
        raise ValueError(
            "export_predictor freezes single-device programs; build the "
            "Predictor with data_parallel=False (a multi-chip deployment "
            "re-shards at load time and should serve live)"
        )
    # host copy of the weights; positional leaves are the cross-process
    # param contract (the loader rebuilds the same flat list, so no
    # treedef has to serialize)
    params = jax.device_get(pred._params)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    leaf_avals = [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in leaves]
    # positional index of the text_feats leaf: offline set_classes swaps
    # exactly this entry of the loader's leaf list
    flat_with_path = jax.tree_util.tree_flatten_with_path(params)[0]
    tf_idx = next(
        i for i, (path, _) in enumerate(flat_with_path)
        if path and getattr(path[0], "key", None) == "text_feats"
    )
    step = pred._step
    step_packed = pred._step_packed
    embed_step = pred._embed_step
    buckets = list(pred._buckets or [])

    # offline label swaps: freeze the text tower (it lives in the param
    # tree — serve.py keeps it for the live set_classes) + ship the BPE
    # vocab, UNLESS the checkpoint prompt-tunes its text features (trained
    # parameters — swapping would discard the tuning, same refusal as the
    # live path) or the build host has no vocab asset to ship
    text_skip = None
    bpe_src = None
    if pred._cfg.prompt_tuning:
        text_skip = ("this checkpoint prompt-tunes its text features "
                     "(trained parameters); swapping class names would "
                     "discard the tuning — rebuild with a matching "
                     "checkpoint, then re-export")
    else:
        from .models.clip.tokenizer import bpe_asset_paths

        bpe_src = next((p for p in bpe_asset_paths()
                        if p and os.path.exists(p)), None)
        if bpe_src is None:
            text_skip = ("the build host had no BPE vocab asset, so the "
                         "bundle carries no tokenizer — re-export with "
                         "bpe_simple_vocab_16e6.txt.gz present (or "
                         "EVENTCLIP_BPE_PATH set) to enable offline "
                         "set_classes")

    def frozen(leaf_list, windows, valid):
        p = jax.tree_util.tree_unflatten(treedef, leaf_list)
        return step(p, windows, valid)

    wins_aval = jax.ShapeDtypeStruct(
        (pred.batch_size, pred.views, pred.window, 3), np.int16)
    valid_aval = jax.ShapeDtypeStruct((pred.batch_size, pred.views),
                                      np.bool_)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = list(platforms)
    if pallas:
        kwargs["disabled_checks"] = [
            jexport.DisabledSafetyCheck.custom_call("tpu_custom_call")
        ]

    def do_exports():
        programs = {
            _STEP_NAME: jexport.export(jax.jit(frozen), **kwargs)(
                leaf_avals, wins_aval, valid_aval)
        }
        if step_packed is not None:
            def frozen_packed(leaf_list, windows, view_src, valid):
                p = jax.tree_util.tree_unflatten(treedef, leaf_list)
                return step_packed(p, windows, view_src, valid)

            for k in buckets:
                programs[_packed_name(k)] = jexport.export(
                    jax.jit(frozen_packed), **kwargs)(
                        leaf_avals,
                        jax.ShapeDtypeStruct((k, pred.window, 3), np.int16),
                        jax.ShapeDtypeStruct((k,), np.int32),
                        valid_aval)
        if text_skip is None:
            # tokens -> L2-normalized text features, the device half of
            # compute_text_features (same f32 numerics as the live
            # set_classes). One n_cls: the classification programs bake
            # the class COUNT into their logits shape anyway, so only
            # same-count swaps can reuse them — exactly the live path's
            # no-retrace case (serve.py::set_classes)
            from .models.classifier import normalize as l2norm
            from .models.clip.model import encode_text

            text_cfg = pred._cfg.clip.text

            def frozen_text(leaf_list, tokens):
                p = jax.tree_util.tree_unflatten(treedef, leaf_list)
                return l2norm(encode_text(p["clip"]["text"], text_cfg,
                                          tokens))

            programs[_TEXT_NAME] = jexport.export(
                jax.jit(frozen_text), **kwargs)(
                    leaf_avals,
                    jax.ShapeDtypeStruct(
                        (len(pred.class_names), text_cfg.context_length),
                        np.int32))
        if embed_step is not None:
            def frozen_embed(leaf_list, windows, valid):
                p = jax.tree_util.tree_unflatten(treedef, leaf_list)
                return embed_step(p, windows, valid)

            programs[_EMBED_NAME] = jexport.export(
                jax.jit(frozen_embed), **kwargs)(
                    leaf_avals, wins_aval, valid_aval)
        return programs

    if pallas:
        programs = do_exports()
    else:
        # the rasterize jits are keyed on the Pallas env gate
        # (ops/pallas_gate.py + rasterize._raster_env_key), so flipping it
        # for the trace lowers the XLA formulation without touching the
        # live predictor's compiled programs
        old = os.environ.get("EVENTCLIP_NO_PALLAS")
        os.environ["EVENTCLIP_NO_PALLAS"] = "1"
        try:
            programs = do_exports()
        finally:
            if old is None:
                del os.environ["EVENTCLIP_NO_PALLAS"]
            else:
                os.environ["EVENTCLIP_NO_PALLAS"] = old

    bpe_text = None
    if text_skip is None:
        import gzip

        opener = gzip.open if bpe_src.endswith(".gz") else open
        with opener(bpe_src, "rt", encoding="utf-8") as f:
            bpe_text = f.read()

    meta = {
        "format_version": _FORMAT_VERSION,
        "class_names": list(pred.class_names),
        # host recipe for offline set_classes (or why it's unavailable);
        # text_feats_idx is the positional leaf the swap replaces
        "text_feats_idx": int(tf_idx),
        "text": ({"skip": text_skip} if text_skip is not None else {
            "prompt": pred._prompt,
            "context_length": int(pred._cfg.clip.text.context_length),
            "n_cls": len(pred.class_names),
        }),
        "embed": embed_step is not None,
        "batch_size": int(pred.batch_size),
        "views": int(pred.views),
        "window": int(pred.window),
        "resolution": [int(pred.resolution[0]), int(pred.resolution[1])],
        "tta": bool(pred.tta),
        "buckets": [int(k) for k in (buckets if step_packed is not None
                                     else [])],
        "params_manifest": [
            {"dtype": str(np.asarray(x).dtype), "shape": list(x.shape)}
            for x in leaves
        ],
        # weight leaves are raw native-endian bytes; record the build
        # host's byte order so a cross-endian serving host errors instead
        # of silently viewing garbage (dtype .str can't carry this for
        # bf16, whose numpy repr is an opaque '<V2')
        "byteorder": sys.byteorder,
        "platforms": list(programs[_STEP_NAME].platforms),
        "pallas": bool(pallas),
        "jax_version": jax.__version__,
    }
    tmp = path + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr(_META_NAME, json.dumps(meta, indent=1))
        # weight bytes are dense float data — STORED (deflating ~GB of
        # weights costs minutes for ~nothing), streamed straight into the
        # member so a ViT-L bundle never holds a second full weight copy
        info = zipfile.ZipInfo(_PARAMS_NAME)
        info.compress_type = zipfile.ZIP_STORED
        with z.open(info, "w", force_zip64=True) as fh:
            np.savez(fh, **{f"{i:05d}": _leaf_bytes(x)
                            for i, x in enumerate(leaves)})
        if bpe_text is not None:
            z.writestr(_BPE_NAME, bpe_text)
        for name, prog in programs.items():
            z.writestr(name, bytes(prog.serialize()))
    os.replace(tmp, path)
    return meta


class ExportedPredictor(Predictor):
    """Serve from a bundle written by `export_predictor`.

    Subclasses the live Predictor but builds NO model: the device phase
    is the deserialized frozen programs (padded + one per view-pack
    bucket) fed the bundle's weight leaves, and every host method (stream
    validation, content-seeded windowing, TTA variants, chunking/packing,
    probability finalization) is inherited UNCHANGED — an
    ExportedPredictor's answers equal the exporting Predictor's on the
    same streams (pinned by tests/test_export.py).
    """

    def __init__(self, path: str):
        import jax

        from .utils.jax_setup import setup_jax

        setup_jax()
        from jax import export as jexport

        with zipfile.ZipFile(path) as z:
            meta = json.loads(z.read(_META_NAME).decode("utf-8"))
            if meta.get("format_version") != _FORMAT_VERSION:
                raise ValueError(
                    f"{path}: bundle format {meta.get('format_version')} "
                    f"!= supported {_FORMAT_VERSION} — re-export with this "
                    f"version's eventclip_tpu.export"
                )
            members = set(z.namelist())
            step_blob = z.read(_STEP_NAME)
            packed_blobs = {int(k): z.read(_packed_name(k))
                            for k in meta.get("buckets", [])}
            text_blob = (z.read(_TEXT_NAME) if _TEXT_NAME in members
                         else None)
            embed_blob = (z.read(_EMBED_NAME) if _EMBED_NAME in members
                          else None)
            bpe_text = (z.read(_BPE_NAME).decode("utf-8")
                        if _BPE_NAME in members else None)
            # stream the weights out of the STORED member (seekable), so
            # loading never holds a spare full-model byte blob
            with z.open(_PARAMS_NAME) as fh, np.load(fh) as npz:
                raw_leaves = [npz[f"{i:05d}"]
                              for i in range(len(meta["params_manifest"]))]

        build_order = meta.get("byteorder", "little")
        if build_order != sys.byteorder:
            raise ValueError(
                f"{path} stores {build_order}-endian weight bytes but this "
                f"host is {sys.byteorder}-endian — re-export on a matching "
                f"host (the leaves are raw native-order bytes)"
            )
        backend = jax.default_backend()
        if backend not in meta["platforms"]:
            raise ValueError(
                f"{path} was lowered for {meta['platforms']}, but this "
                f"process runs on '{backend}' — re-export with "
                f"platforms=('{backend}',) or a multi-platform list"
            )
        self.meta = meta
        self.class_names = list(meta["class_names"])
        self.batch_size = int(meta["batch_size"])
        self.views = int(meta["views"])
        self.window = int(meta["window"])
        self.resolution = (int(meta["resolution"][0]),
                           int(meta["resolution"][1]))
        self.tta = bool(meta["tta"])

        # weights: raw bytes -> typed leaves, placed once; the positional
        # leaf list IS the param pytree every frozen program expects
        leaves = [
            raw.view(np.dtype(spec["dtype"])).reshape(spec["shape"])
            for raw, spec in zip(raw_leaves, meta["params_manifest"])
        ]
        self._params = jax.device_put(leaves)

        # the inherited dispatch passes (params, windows, valid[, ...]);
        # deserialized calls take exactly that signature
        self._step = jax.jit(jexport.deserialize(bytearray(step_blob)).call)
        self._mesh = None
        self._shard_batch = None
        self._embed_step = (
            jax.jit(jexport.deserialize(bytearray(embed_blob)).call)
            if embed_blob is not None else None
        )
        # offline label swaps: the frozen text program + the bundled BPE
        # vocab (tokenizer built lazily — parsing ~49k merges costs real
        # time and most deployments never swap)
        self._text_call = (
            jax.jit(jexport.deserialize(bytearray(text_blob)).call)
            if text_blob is not None else None
        )
        self._bpe_text = bpe_text
        self._tokenizer = None
        self._tf_idx = meta.get("text_feats_idx")
        self._buckets = sorted(packed_blobs) or None
        self._step_packed = None
        if packed_blobs:
            calls = {k: jax.jit(jexport.deserialize(bytearray(b)).call)
                     for k, b in sorted(packed_blobs.items())}

            def step_packed(p, windows, view_src, valid):
                # bucket identity is the (static) packed-axis length
                return calls[int(windows.shape[0])](p, windows, view_src,
                                                    valid)

            self._step_packed = step_packed

    def set_classes(self, class_names) -> None:
        """Offline label swap: tokenize the prompted names with the
        bundled BPE vocab, run the frozen text program, and replace the
        text_feats leaf — CLIP's open-vocabulary promise survives
        deployment (same recipe as the live serve.Predictor.set_classes).

        Same-COUNT swaps only: every frozen classification program bakes
        n_cls into its logits shape, and a bundle cannot retrace — a
        different label count needs the live model and a re-export.
        ValueError throughout: the category the HTTP layer maps to 400."""
        import jax
        import jax.numpy as jnp

        info = self.meta.get("text") or {}
        if self._text_call is None:
            raise ValueError(
                "this bundle cannot swap labels: "
                + info.get("skip",
                           "it was exported before text-tower freezing — "
                           "re-export with this version's "
                           "eventclip_tpu.export")
            )
        names = [str(n) for n in class_names]
        if not names:
            raise ValueError("class_names must be non-empty")
        if len(names) != info["n_cls"]:
            raise ValueError(
                f"the frozen programs bake n_cls={info['n_cls']} into "
                f"their logits shapes; an exported bundle can only swap to "
                f"the same count (got {len(names)}) — different counts "
                "need the live model and a re-export"
            )
        from .models.classifier import tokenize_prompts

        if self._tokenizer is None:
            from .models.clip.tokenizer import SimpleTokenizer, parse_merges

            self._tokenizer = SimpleTokenizer(
                merges=parse_merges(self._bpe_text))
        toks = tokenize_prompts(names, info["prompt"], self._tokenizer,
                                info["context_length"])
        feats = self._text_call(self._params, jnp.asarray(toks))
        self._params = list(self._params)
        self._params[self._tf_idx] = jax.device_put(feats)
        self.class_names = names

    def embed(self, event_streams):
        if self._embed_step is None:
            raise RuntimeError(
                "the bundle was exported without --embed; re-export with "
                "--embed, or build a live Predictor(embed=True)"
            )
        if not len(event_streams):
            dim = int(self.meta["params_manifest"][self._tf_idx]
                      ["shape"][-1])
            return np.zeros((0, dim), np.float32)
        wins, valids = self.gather_windows(event_streams)
        return self.embed_windows(wins, valids)


def main(argv: Optional[Sequence[str]] = None) -> None:
    import argparse

    ap = argparse.ArgumentParser(
        description="Export a serving bundle (frozen programs + weights)")
    ap.add_argument("--params", required=True, help="experiment config .py")
    ap.add_argument("--out", required=True, help="output bundle path")
    ap.add_argument("--classes", default="", help="one class name per line")
    ap.add_argument("--data_root", default="",
                    help="derive class names from this dataset tree")
    ap.add_argument("--weight", default="", help="trained checkpoint "
                    "(.npz or reference .pth)")
    ap.add_argument("--clip_ckpt", default="", help="OpenAI CLIP .pt")
    ap.add_argument("--smoke", action="store_true",
                    help="random CLIP weights (pipeline validation)")
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--int8_calib", default="",
                    help="with --int8: glob of .npy raw event dumps to "
                    "calibrate STATIC activation scales on (~1.43x encode; "
                    "the scales freeze into the bundle)")
    ap.add_argument("--prune_tokens", type=int, default=0)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--tta", action="store_true")
    ap.add_argument("--embed", action="store_true",
                    help="also freeze the embeddings program "
                    "(raw events -> one L2-normalized CLIP feature per "
                    "stream, the retrieval use case)")
    ap.add_argument("--platforms", default="",
                    help="comma list, e.g. cpu,tpu (default: this backend)")
    ap.add_argument("--pallas", action="store_true",
                    help="keep Mosaic kernels (TPU-only artifact, no "
                    "cross-version custom-call guarantee)")
    ap.add_argument("--cpu", action="store_true",
                    help="build/export on CPU (env vars alone cannot "
                    "switch platforms once jax is imported)")
    ap.add_argument("--check", action="store_true",
                    help="reload the bundle and verify it reproduces the "
                    "live predictor on random streams")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from .server import resolve_class_names
    from .utils.config import load_params

    params = load_params(args.params)
    names = resolve_class_names(params, args.classes, args.data_root)
    calib_streams = None
    if args.int8_calib:
        import glob as globlib

        files = sorted(globlib.glob(args.int8_calib))
        if not files:
            ap.error(f"--int8_calib matched no files: {args.int8_calib}")
        calib_streams = [np.load(f) for f in files]
    pred = Predictor(
        params, names, weight=args.weight,
        clip_ckpt=args.clip_ckpt or None, smoke=args.smoke,
        int8=args.int8, int8_calib_streams=calib_streams,
        prune_tokens=args.prune_tokens,
        batch_size=args.batch_size, tta=args.tta, embed=args.embed,
    )
    platforms = ([p.strip() for p in args.platforms.split(",") if p.strip()]
                 or None)
    meta = export_predictor(pred, args.out, platforms=platforms,
                            pallas=args.pallas)
    size = os.path.getsize(args.out)
    print(f"wrote {args.out} ({size / 1e6:.1f} MB): "
          f"{len(meta['class_names'])} classes, batch {meta['batch_size']}, "
          f"pack buckets {meta['buckets'] or 'off'}, "
          f"platforms {meta['platforms']}")
    if args.check:
        rng = np.random.default_rng(0)
        h, w = pred.resolution
        streams = [
            np.stack([rng.integers(0, w, n), rng.integers(0, h, n),
                      np.sort(rng.random(n)),
                      rng.choice([-1.0, 1.0], n)], axis=1).astype(np.float32)
            for n in (pred.window // 2, pred.window * pred.views)
        ]
        loaded = ExportedPredictor(args.out)
        live = pred.predict(streams)["probs"]
        frozen = loaded.predict(streams)["probs"]
        delta = float(np.abs(live - frozen).max())
        # both sides route the same bucket policy, so the only daylight is
        # float reduction order between the live trace and the
        # deserialized program
        print(f"check: max |live - exported| prob delta = {delta:.2e}")
        if delta > 1e-4:
            raise SystemExit("check FAILED: exported bundle diverges")
        if loaded._text_call is not None:
            # the offline swap must track the live one: reversed labels
            # permute text features, both sides re-predict identically
            rev = list(reversed(pred.class_names))
            pred.set_classes(rev)
            loaded.set_classes(rev)
            d = float(np.abs(pred.predict(streams)["probs"]
                             - loaded.predict(streams)["probs"]).max())
            print(f"check: set_classes prob delta = {d:.2e}")
            if d > 1e-4:
                raise SystemExit("check FAILED: offline set_classes "
                                 "diverges from the live swap")
        if args.embed:
            d = float(np.abs(pred.embed(streams)
                             - loaded.embed(streams)).max())
            print(f"check: embed delta = {d:.2e}")
            if d > 1e-4:
                raise SystemExit("check FAILED: exported embed diverges")
        print("check OK")


if __name__ == "__main__":
    main()
