"""Batch inference API: raw event streams -> class predictions.

The reference has no serving surface — deployment means re-running its
test.py over a dataset directory. This module packages the same eval
pipeline (window gathering -> on-device rasterize/preprocess -> CLIP ->
aggregation, exactly the path `test.py` drives; reference semantics
datasets/event2img.py + models/clip_cls.py) behind a `Predictor` object
for production use:

- params/weights are resolved and placed once; every call reuses a small
  fixed set of compiled programs (fixed [B, V, N, 3] window shapes —
  arbitrary request sizes are chunked/padded to the compiled batch, and
  chunks with idle view slots run a view-PACKED variant at one of 4
  bucketed K, so short streams never pay for empty encodes; no retraces);
- input is a list of raw event arrays ([n, 4] float x/y/t/p, the layout
  every supported sensor dump decodes to), not a dataset tree;
- opt-in W8A8 int8 tower (`int8=True`, ~1.3x encode), token pruning
  (`prune_tokens=K`, stacks with int8 for ~2x e2e), data-parallel
  batch sharding over all local devices (`data_parallel=True`), and
  4-variant event TTA (`tta=True`, gen_data's robustness trick at 4x
  compute: probabilities averaged over identity/h-flip/t-flip/both);
- opt-in embeddings (`embed=True` + `Predictor.embed`): one
  L2-normalized CLIP feature per stream, for retrieval/indexing over
  event recordings rather than closed-set classification;
- runtime label-set swaps (`set_classes`): CLIP's open-vocabulary
  promise — new class names cost one prompted text-tower pass, no
  rebuild (same-count swaps reuse every compiled program);
- online inference (`StreamSession`): append a live sensor feed chunk
  by chunk, poll a rolling prediction over the most recent
  view_budget x window events — the continuous-stream deployment shape
  event cameras actually have, routed through the identical compiled
  path (a session's answer == Predictor.predict on its buffer).

Example:
    from eventclip_tpu.serve import Predictor
    pred = Predictor.from_config("configs/zsclip/zsclip_nc_params.py",
                                 class_names=names, clip_ckpt="ViT-L-14.pt")
    out = pred(list_of_event_arrays)       # {'label', 'probs', 'names'}
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import numpy as np


class Predictor:
    """Compiled-once event-stream classifier (see module docstring)."""

    def __init__(
        self,
        params,
        class_names: Sequence[str],
        weight: str = "",
        clip_ckpt: Optional[str] = None,
        smoke: bool = False,
        int8: bool = False,
        int8_calib_streams: Optional[Sequence[Any]] = None,
        prune_tokens: int = 0,
        batch_size: int = 32,
        data_parallel: bool = False,
        pack_views: bool = True,
        tta: bool = False,
        embed: bool = False,
    ):
        import jax
        import jax.numpy as jnp

        from .utils.jax_setup import setup_jax

        setup_jax()  # serving cold starts amortize the 30-500 s compiles

        from .data.datasets import DATASET_CLASSES
        from .data.event_windows import parse_quantize_args
        from .engine.checkpoint import load_checkpoint
        from .engine.trainer import (
            DEFAULT_PROMPT,
            build_text_features,
            resolve_clip_params,
            snapshot_logit_scale,
        )
        from .models.classifier import (
            build_classifier_config,
            classifier_forward,
            init_classifier_params,
        )
        from .models.clip.config import clip_arch_config
        from .ops.preprocess import ClipPreprocess
        from .ops.rasterize import RasterSpec, rasterize_for_clip

        self.class_names = list(class_names)
        self.batch_size = int(batch_size)
        # 4-variant event TTA (identity / h-flip / t-flip / both), the
        # reference's gen_data robustness trick (datasets/event2img.py
        # _load_tta_data): each stream costs 4 device rows, probabilities
        # are averaged across variants
        self.tta = bool(tta)

        # trainable models served without a checkpoint would silently
        # classify with random adapter/LoRA/prompt weights and return
        # plausible-looking garbage — the same contract test.py enforces
        # ("non-ZS evaluation needs --weight", test.py)
        if params.model != "ZSCLIP" and not weight:
            raise ValueError(
                f"{params.model} has trainable weights; pass weight=<ckpt> "
                "(serving it untrained would return random-adapter garbage). "
                "Only ZSCLIP may be served without a checkpoint."
            )

        # sensor geometry + view budget from the config's dataset stats
        # (no dataset tree needed); eval view budget is the reference's
        # forced max_imgs=10 (datasets/__init__.py:23); the parsing rules
        # are shared with the dataset pipeline (parse_quantize_args)
        ds = DATASET_CLASSES[params.dataset]
        self.window, self.views, raster_args = parse_quantize_args(
            params.quantize_args, ds.resolution, ds.max_n, hard_limit=10
        )
        self.resolution = ds.resolution
        self._spec = RasterSpec(**raster_args)

        clip_cfg = clip_arch_config(params.clip_dict["arch"])
        dtype = jnp.bfloat16 if bool(params.get("bf16", True)) else jnp.float32
        self._cfg = build_classifier_config(params, clip_cfg, dtype=dtype)
        if prune_tokens > 0:
            import dataclasses

            self._cfg = dataclasses.replace(self._cfg,
                                            keep_tokens=prune_tokens)
        rng = jax.random.PRNGKey(0)
        clip_params, pretrained = resolve_clip_params(
            params, clip_cfg, rng, clip_ckpt, smoke=smoke
        )
        self._cfg = snapshot_logit_scale(self._cfg, clip_params, pretrained)
        # retained for set_classes (runtime label-set swaps re-prompt the
        # text tower, which lives on in self._params["clip"]["text"])
        self._prompt = params.clip_dict.get("prompt", DEFAULT_PROMPT)
        self._pretrained = pretrained
        text_feats = build_text_features(
            clip_params, clip_cfg, self.class_names, self._prompt,
            pretrained,
        )
        model_params = init_classifier_params(
            rng, self._cfg, clip_params=clip_params, text_feats=text_feats
        )
        pp = ClipPreprocess(in_height=ds.resolution[0],
                            in_width=ds.resolution[1],
                            image_size=clip_cfg.vision.image_size)

        if weight:
            model_params, _ = load_checkpoint(weight, target=model_params)
        if int8:
            from .ops.quant import quantize_classifier_params

            act_amax = None
            if int8_calib_streams is not None and len(int8_calib_streams):
                # calibrated static activation scales (~1.43x vs 1.28x
                # bf16 encode): window + rasterize the provided raw event
                # streams through the production host path and fit
                # per-(layer, site) maxima on the FLOAT tower. Dynamic
                # per-token scales stay the default when no streams are
                # given (no clipping risk on unseen traffic).
                from .ops.quant import calibrate_visual_amax

                wins, _ = self.gather_windows(list(int8_calib_streams))
                w = jnp.asarray(wins)
                imgs = jax.jit(
                    lambda ww: rasterize_for_clip(self._spec, pp, ww)
                )(w.reshape((-1,) + w.shape[-2:]))
                act_amax = calibrate_visual_amax(
                    model_params["clip"]["visual"], clip_cfg.vision, imgs,
                    dtype=dtype,
                )
            model_params = quantize_classifier_params(model_params,
                                                      act_amax=act_amax)
        # data_parallel shards each compiled batch over all local devices
        # (the eval CLI's DP layout — parallel/sharding.py); single-device
        # placement stays uncommitted (the relay dispatch-cost quirk)
        from .parallel import make_mesh, shard_batch, shard_params

        self._mesh = make_mesh() if data_parallel else None
        if self._mesh is not None:
            n_data = self._mesh.shape["data"]
            self.batch_size = max(
                self.batch_size - self.batch_size % n_data, n_data
            )
            self._params = shard_params(model_params, self._mesh)
        else:
            self._params = jax.device_put(model_params)

        @jax.jit
        def step(p, windows, valid):
            x = rasterize_for_clip(self._spec, pp, windows,
                                       mesh=self._mesh)
            return classifier_forward(p, self._cfg, x, valid)["probs"]

        self._step = step

        # optional embeddings program (raw events -> one L2-normalized CLIP
        # feature per stream, the retrieval/indexing use case). Opt-in: it
        # is one more 30-500 s remote compile at construction/warm-up that
        # pure classification deployments should not pay.
        self._embed_step = None
        if embed:
            from .models.classifier import normalize as l2norm

            @jax.jit
            def embed_step(p, windows, valid):
                x = rasterize_for_clip(self._spec, pp, windows,
                                       mesh=self._mesh)
                out = classifier_forward(p, self._cfg, x, valid)
                # per-view features at the text-matmul point; normalize
                # uniformly (ZS features arrive raw), zero the padding,
                # mean over valid views, re-normalize
                f = l2norm(out["view_feats"]) * valid[..., None]
                n = jnp.maximum(valid.sum(-1, keepdims=True), 1)
                return l2norm(f.sum(1) / n)  # [B, C]

            self._embed_step = embed_step
        self._shard_batch = (
            (lambda b: shard_batch(b, self._mesh))
            if self._mesh is not None else None
        )

        # view packing (same economy as eval): streams shorter than the
        # view budget leave padded slots, and the padded step encodes them
        # anyway; packed chunks encode only real views at one of 4
        # bucketed static K. eval_pack_buckets is the ONE bucket policy
        # (shared with trainer.evaluate and test.py, incl. the
        # EVENTCLIP_NO_PACK_EVAL escape hatch).
        self._step_packed = None
        self._buckets = None
        if pack_views:
            from .data.loader import eval_pack_buckets
            from .models.classifier import classifier_forward_packed

            n_data = self._mesh.shape["data"] if self._mesh is not None else 1
            self._buckets = eval_pack_buckets(self.batch_size, self.views,
                                              n_data)

            @jax.jit
            def step_packed(p, windows, view_src, valid):
                x = rasterize_for_clip(self._spec, pp, windows,
                                       mesh=self._mesh)
                return classifier_forward_packed(
                    p, self._cfg, x, view_src, valid
                )["probs"]

            self._step_packed = step_packed

    # -- host half -----------------------------------------------------------

    def _prep(self, events: np.ndarray) -> tuple:
        """Validate + canonicalize one stream -> (centered events, rng)."""
        import zlib

        from .data.host_ops import prepare_stream

        # own copy: the polarity remap below is in place and must never
        # mutate the caller's array (or the content hash)
        events = np.array(events, dtype=np.float32, copy=True)
        assert events.ndim == 2 and events.shape[1] == 4, (
            f"expected [n, 4] x/y/t/p events, got {events.shape}"
        )
        if events.shape[0] == 0:
            raise ValueError(
                "empty event stream (0 events) — an idle sensor window has "
                "no defined prediction; filter empty streams before predict()"
            )
        if events.size and events[:, 3].min() >= -0.5:
            # 0/1 polarity encoding (raw N-ImageNet-style dumps) -> ±1,
            # the loaders' rule (datasets.py::load_event_npz); the
            # rasterizer treats p == 0 as padding, so unmapped 0/1 would
            # silently drop every negative event
            events[:, 3] = np.where(events[:, 3] <= 0.5, -1.0, 1.0)
        # view subsampling (streams longer than the view budget) must be
        # deterministic AND independent of the stream's position in the
        # request, so batching never changes a row's prediction: seed from
        # the (pre-centering) stream content
        rng = np.random.default_rng(
            zlib.crc32(np.ascontiguousarray(events).tobytes())
        )
        events = prepare_stream(events, self.resolution)
        return events, rng

    def _windows(self, events: np.ndarray) -> tuple:
        from .data.host_ops import gather_event_windows

        events, rng = self._prep(events)
        return gather_event_windows(
            events, self.window, self.views, rng=rng, packed=True
        )

    def _windows_tta(self, events: np.ndarray) -> tuple:
        """4 variants -> ([4, V, N, 3] int16, [4, V] bool), reference
        variant order: identity, h-flip, t-flip, both.

        The 4 gathers consume ONE content-seeded rng sequentially —
        exactly EventWindowDataset._load_tta_item's draw order — so TTA
        here reproduces gen_data's windows. Consequence: for streams
        longer than the view budget (where gathering subsamples), the
        result is NOT the mean of 4 standalone per-variant predict()
        calls (each of those would reseed from its own flipped content);
        for shorter streams the two formulations coincide."""
        from .data.host_ops import gather_event_windows, tta_variants

        events, rng = self._prep(events)
        pairs = [
            gather_event_windows(v, self.window, self.views, rng=rng,
                                 packed=True)
            for v in tta_variants(events, self.resolution)
        ]
        return (np.stack([w for w, _ in pairs]),
                np.stack([m for _, m in pairs]))

    # -- public API ----------------------------------------------------------

    def __call__(self, event_streams) -> Dict[str, Any]:
        return self.predict(event_streams)

    def predict(
        self, event_streams: List[np.ndarray], top_k: int = 1
    ) -> Dict[str, Any]:
        """Classify raw event streams.

        event_streams: list of [n, 4] float arrays (x, y, t in s, p ±1/0-1).
        Returns {'label': [B] int, 'names': [B] str, 'probs': [B, C] f32,
        'topk': [B, top_k] int} with rows aligned to the input order.
        """
        if not len(event_streams):
            n_cls = len(self.class_names)
            return {
                "label": np.zeros((0,), np.int64), "names": [],
                "probs": np.zeros((0, n_cls), np.float32),
                "topk": np.zeros((0, min(top_k, n_cls)), np.int64),
            }
        wins, valids = self.gather_windows(event_streams)
        return self.predict_windows(wins, valids, top_k=top_k)

    def gather_windows(self, event_streams) -> tuple:
        """Host half: validate + window every stream -> stacked
        ([B, V, N, 3] int16, [B, V] bool); with tta=True every stream
        contributes 4 consecutive variant rows ([B*4, ...]). Validates
        per-stream up front so batch callers learn WHICH input was bad,
        not just that one was. Shared by predict() and server.py's
        MicroBatcher (which runs this on each request's own thread and
        fuses only the device phase)."""
        windower = self._windows_tta if self.tta else self._windows
        pairs = []
        for i, e in enumerate(event_streams):
            try:
                pairs.append(windower(e))
            except (ValueError, AssertionError) as err:
                raise ValueError(
                    f"event_streams[{i}]: {err}"
                ) from None
        wins, valids = zip(*pairs)
        wins, valids = np.stack(wins), np.stack(valids)
        if self.tta:  # [B, 4, V, ...] -> [B*4, V, ...], variant-major rows
            wins = wins.reshape((-1,) + wins.shape[2:])
            valids = valids.reshape((-1,) + valids.shape[2:])
        return wins, valids

    def predict_windows(
        self, wins: np.ndarray, valids: np.ndarray, top_k: int = 1
    ) -> Dict[str, Any]:
        """Device phase on pre-gathered windows (`_windows` output, stacked).

        Split out from predict() so request fusers (server.py's
        micro-batcher) can validate/window each request on its own thread
        and run ONE fused device batch for all of them.
        """
        probs = self._run_chunked(wins, valids, self._dispatch_chunk)
        return self.finalize(probs, top_k)

    def _run_chunked(self, wins: np.ndarray, valids: np.ndarray,
                     dispatch, pack: bool = True) -> np.ndarray:
        """Shared device loop: split into compiled-batch chunks (padding
        the tail), place + run each, concatenate the per-row outputs.
        Double-buffered like trainer.fit — chunk k+1's H2D copy overlaps
        chunk k's dispatched forward (multi-chunk jobs only)."""
        bs = self.batch_size

        def chunks():
            for i in range(0, len(wins), bs):
                w, v = wins[i:i + bs], valids[i:i + bs]
                pad = bs - len(w)
                if pad:  # fixed compiled batch; padded rows sliced off below
                    w = np.concatenate(
                        [w, np.zeros((pad,) + w.shape[1:], w.dtype)])
                    v = np.concatenate(
                        [v, np.zeros((pad,) + v.shape[1:], bool)])
                yield w, v, pad

        from .data.loader import device_prefetch

        def place(chunk):
            w, v, pad = chunk
            return self._place_chunk(w, v, pack=pack), pad

        out = []
        for batch, pad in device_prefetch(chunks(), place):
            o = dispatch(batch)
            out.append(o[: bs - pad])  # device array; sync below
        # one host fetch at the end — a per-chunk np.asarray would sync
        # before the next placement and forfeit the overlap
        return np.concatenate([np.asarray(o) for o in out])[: len(wins)]

    def _place_chunk(self, wins: np.ndarray, valids: np.ndarray,
                     pack: bool = True):
        """One [batch_size, V, ...] host chunk -> device-ready batch
        (view-pack -> place -> shard). pack=False skips view packing
        (the embed program compiles padded-only)."""
        import jax.numpy as jnp

        from .data.loader import pack_view_batch

        batch = {"windows": wins, "valid_mask": valids}
        if pack and self._buckets:
            batch = pack_view_batch(batch, self._buckets)
        batch = {k: jnp.asarray(x) for k, x in batch.items()}
        if self._shard_batch is not None:
            batch = self._shard_batch(batch)
        return batch

    def _dispatch_chunk(self, batch):
        """Run the compiled step a placed chunk selects (packed program
        keyed by the chunk's bucket, or the single padded program)."""
        if "view_src" in batch:
            return self._step_packed(self._params, batch["windows"],
                                     batch["view_src"], batch["valid_mask"])
        return self._step(self._params, batch["windows"],
                          batch["valid_mask"])

    def warm_up(self, log=None) -> None:
        """Compile every device program a request can select, before
        serving traffic (remote-TPU compiles take 30-500 s; an on-request
        compile looks like an outage).

        With view packing the compiled set is one packed step per bucket
        K — warmed by crafting a device chunk whose valid-view count
        packs to exactly that bucket. Crafting CHUNKS (not streams) makes
        the coverage exact for every batch_size/tta combination: warming
        through predict() cannot reach the top bucket when batch_size is
        not a multiple of the 4-row TTA expansion. Without packing there
        is a single padded program. ``log`` (e.g. ``print``) reports
        per-program progress."""
        rng = np.random.default_rng(0)
        bs, budget, n = self.batch_size, self.views, self.window
        h, w = self.resolution

        def chunk(n_valid):
            wins = np.stack([
                rng.integers(0, w, (bs, budget, n)),
                rng.integers(0, h, (bs, budget, n)),
                np.where(rng.random((bs, budget, n)) < 0.5, -1, 1),
            ], axis=-1).astype(np.int16)  # packed (x, y, p) layout
            valids = np.zeros(bs * budget, bool)
            valids[:n_valid] = True
            return wins, valids.reshape(bs, budget)

        total = bs * budget
        # pack_view_batch picks the smallest bucket >= the valid count, so
        # n_valid=k lands exactly on bucket k (the top bucket may round up
        # past the batch's total slots — cap there)
        targets = [min(k, total) for k in (self._buckets or [total])]
        for i, want in enumerate(targets):
            if log is not None:
                log(f"warm-up: compiling program {i + 1}/{len(targets)} "
                    f"(valid views={want})...")
            out = self._dispatch_chunk(self._place_chunk(*chunk(want)))
            float(np.asarray(out).sum())  # force execution (relay no-op sync)
        if self._embed_step is not None:
            if log is not None:
                log("warm-up: compiling the embed program...")
            batch = self._place_chunk(*chunk(total), pack=False)
            f = self._embed_step(self._params, batch["windows"],
                                 batch["valid_mask"])
            float(np.asarray(f).sum())

    def finalize(self, probs: np.ndarray, top_k: int = 1) -> Dict[str, Any]:
        """Per-variant-row probabilities -> the prediction dict. With TTA,
        every 4 consecutive rows are one stream's variants and collapse to
        their mean (gen_data's aggregation, reference gen_data.py:154)."""
        if self.tta:
            probs = probs.reshape(-1, 4, probs.shape[-1]).mean(axis=1)
        label = probs.argmax(-1)
        k = min(int(top_k), probs.shape[-1])
        topk = np.argsort(-probs, axis=-1)[:, :k]
        return {
            "label": label,
            "names": [self.class_names[i] for i in label],
            "probs": probs,
            "topk": topk,
        }

    def embed(self, event_streams: List[np.ndarray]) -> np.ndarray:
        """Raw event streams -> [B, C] L2-normalized CLIP features (the
        retrieval/indexing companion to predict()): mean of the per-view
        features; with tta=True additionally the mean over the 4 variants,
        re-normalized. Requires embed=True at construction."""
        if self._embed_step is None:
            raise RuntimeError(
                "Predictor was built without embed=True — the embeddings "
                "program is opt-in (one extra compile at construction)"
            )
        if not len(event_streams):
            dim = int(self._params["text_feats"].shape[-1])
            return np.zeros((0, dim), np.float32)
        wins, valids = self.gather_windows(event_streams)
        return self.embed_windows(wins, valids)

    def embed_windows(self, wins: np.ndarray, valids: np.ndarray
                      ) -> np.ndarray:
        """Device phase of embed() on pre-gathered windows. Uses the one
        padded embed program (no view-packed variants: embedding jobs are
        typically offline/batch, where the ragged-view economy matters
        less than keeping the compiled set small)."""
        feats = self._run_chunked(
            wins, valids,
            lambda b: self._embed_step(self._params, b["windows"],
                                       b["valid_mask"]),
            pack=False,
        ).astype(np.float32)
        if self.tta:  # [B*4, C] variant rows -> mean per stream, re-norm
            feats = feats.reshape(-1, 4, feats.shape[-1]).mean(axis=1)
            feats /= np.maximum(
                np.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
        return feats

    def set_classes(self, class_names: Sequence[str]) -> None:
        """Swap the label set at runtime — CLIP's open-vocabulary promise:
        the class head is just a matmul against prompted text features, so
        new labels only need one text-tower pass (reference semantics:
        clip_cls.py builds text features from the prompt template once).

        A same-count swap reuses every compiled program (text_feats is a
        runtime input); a different count retraces the head on the next
        call — call warm_up() after such a swap on remote-compile
        deployments. Disallowed for prompt-tuned checkpoints, whose text
        features are TRAINED parameters, not encoder outputs. Not
        synchronized with concurrent predict() calls — callers serialize
        (the HTTP route does)."""
        import jax

        from .engine.trainer import build_text_features

        if self._cfg.prompt_tuning:
            raise ValueError(
                "this checkpoint prompt-tunes its text features (trained "
                "parameters); swapping class names would discard the "
                "tuning — rebuild a Predictor with a matching checkpoint"
            )
        names = [str(n) for n in class_names]
        if not names:
            raise ValueError("class_names must be non-empty")
        feats = build_text_features(
            self._params["clip"], self._cfg.clip, names, self._prompt,
            self._pretrained,
        )
        # keep the leaf's placement: the mesh's replicated sharding under
        # data_parallel, UNCOMMITTED single-device otherwise (an explicit
        # sharding would commit the array — the relay dispatch-cost quirk
        # parallel/sharding.py::_single_device documents)
        feats = jax.numpy.asarray(feats, dtype=jax.numpy.float32)
        self._params["text_feats"] = (
            jax.device_put(feats, self._params["text_feats"].sharding)
            if self._mesh is not None else jax.device_put(feats)
        )
        self.class_names = names

    @classmethod
    def from_config(cls, config_path: str, class_names: Sequence[str],
                    **kwargs) -> "Predictor":
        """Build from an experiment config file (the CLIs' --params)."""
        from .utils.config import load_params

        return cls(load_params(config_path), class_names, **kwargs)


class StreamSession:
    """Online sliding-window classification over a LIVE event stream.

    An event camera emits a continuous stream; the offline surfaces
    (test.py, Predictor.predict) classify complete recordings. A
    StreamSession is the deployment shape between them: ``append`` events
    as they arrive (any chunking — per-packet, per-frame-interval, ...),
    ask for a rolling ``predict`` at any time.

    Semantics: the session keeps the most recent ``horizon`` events
    (default view_budget x window — exactly the event capacity the
    offline eval path can see per sample) in a ring buffer, and
    prediction routes the buffer through the UNCHANGED Predictor path
    (centering -> windowing -> packed device forward), so a session's
    answer over its buffer equals ``Predictor.predict([buffer])`` by
    construction — there is no second numeric pipeline to drift. At the
    default horizon the buffer always fits the view budget, so rolling
    predictions are deterministic in the buffer contents.

    Each prediction is one compiled device batch (~1 stream's cost, see
    BASELINE.md serve_latency rows) — poll at whatever rate the latency
    budget allows rather than per-append. append/predict/reset are
    thread-safe; one session is one logical stream (one per sensor).
    """

    def __init__(self, predictor: Predictor, horizon: Optional[int] = None):
        import collections
        import threading

        self._pred = predictor
        self._horizon = int(horizon if horizon is not None
                            else predictor.views * predictor.window)
        if self._horizon < predictor.window:
            raise ValueError(
                f"horizon {self._horizon} is smaller than one window "
                f"({predictor.window} events) — no prediction could ever "
                "see a full view"
            )
        self._chunks: "collections.deque[np.ndarray]" = collections.deque()
        self._n = 0
        self._lock = threading.Lock()

    @property
    def n_events(self) -> int:
        return self._n

    @property
    def horizon(self) -> int:
        return self._horizon

    def append(self, events: np.ndarray) -> int:
        """Buffer a chunk of [n, 4] x/y/t/p events (chronological across
        appends, like any sensor feed); returns the buffered event count
        after trimming to the horizon. Empty chunks are fine (a quiet
        sensor interval)."""
        events = np.asarray(events, dtype=np.float32)
        if events.size == 0:
            # a quiet interval arrives as [] / [[]] from JSON decoders;
            # normalize so "empty chunks are fine" holds for every shape
            events = events.reshape(0, 4)
        if events.ndim != 2 or events.shape[1] != 4:
            raise ValueError(
                f"expected [n, 4] x/y/t/p events, got {events.shape}"
            )
        with self._lock:
            if events.shape[0]:
                # own copy: the caller may reuse its buffer; trimming
                # below also slices views of it otherwise
                self._chunks.append(np.array(events, copy=True))
                self._n += len(events)
                while self._n > self._horizon:
                    extra = self._n - self._horizon
                    head = self._chunks[0]
                    if len(head) <= extra:
                        self._chunks.popleft()
                        self._n -= len(head)
                    else:
                        self._chunks[0] = head[extra:]
                        self._n -= extra
            return self._n

    def events(self) -> np.ndarray:
        """Snapshot of the buffered (most recent <= horizon) events."""
        with self._lock:
            if not self._n:
                return np.empty((0, 4), np.float32)
            return np.concatenate(self._chunks)

    def predict(self, top_k: int = 1, predict_fn=None) -> Dict[str, Any]:
        """Rolling prediction over the buffered events: the single-stream
        slice of Predictor.predict's dict plus 'n_events' (how much
        evidence the prediction saw). ``predict_fn(streams, top_k=...)``
        overrides the device entry — server.py injects its fused/locked
        path so the HTTP session routes share THIS response assembly
        instead of duplicating it."""
        snap = self.events()
        if not len(snap):
            raise ValueError(
                "empty session — append events before predict() (an idle "
                "sensor window has no defined prediction)"
            )
        fn = predict_fn if predict_fn is not None else self._pred.predict
        out = fn([snap], top_k=top_k)
        return {
            "label": int(out["label"][0]),
            "name": out["names"][0],
            "probs": out["probs"][0],
            "topk": out["topk"][0],
            "n_events": int(len(snap)),
        }

    def reset(self) -> None:
        """Drop the buffer (e.g. on scene change); the session stays usable."""
        with self._lock:
            self._chunks.clear()
            self._n = 0


def load_event_file(path: str) -> np.ndarray:
    """One raw sensor dump -> [n, 4] float events.

    .npy = a plain array (N-Caltech/N-Cars layout); .npz = the structured
    N-ImageNet layout (reference datasets/imagenet.py:8-27, parsed by
    data.datasets.load_event_npz) OR a plain ``np.savez`` dump holding a
    single [n, 4] array under any key."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            keys = list(z.files)
            if "event_data" in keys:  # structured N-ImageNet layout
                pass  # fall through to the shared parser below
            elif (len(keys) == 1 and z[keys[0]].ndim == 2
                  and z[keys[0]].shape[1] == 4):
                return z[keys[0]].astype(np.float32)
            else:
                raise ValueError(
                    f"unrecognized npz layout (keys {keys}): expected the "
                    "N-ImageNet 'event_data' structured array or a single "
                    "[n, 4] array"
                )
        from .data.datasets import load_event_npz

        return load_event_npz(path)  # already float32
    return np.load(path).astype(np.float32)


def main(argv=None) -> None:
    """Offline batch inference: classify a folder/glob of raw event dumps
    without a dataset tree, checkpoint sweep, or HTTP server.

        python -m eventclip_tpu.serve --params <cfg> --classes names.txt \\
            --inputs 'dumps/**/*.npy' --out predictions.jsonl [--int8 ...]

    Writes one JSON line per input: {"path", "label", "name", "topk",
    "topk_names"} (+"probs" with --probs), in input order. The reference
    has no equivalent — its test.py needs a class-foldered dataset tree.
    """
    import argparse
    import glob as globlib
    import json
    import sys

    ap = argparse.ArgumentParser(description=main.__doc__.split("\n")[0])
    ap.add_argument("--params", default="")
    ap.add_argument("--from_export", default="",
                    help="classify with a frozen bundle (python -m "
                    "eventclip_tpu.export) instead of building the model; "
                    "model flags are baked into the bundle and rejected")
    ap.add_argument("--inputs", required=True,
                    help="glob of .npy/.npz event dumps (quote it)")
    ap.add_argument("--out", default="-",
                    help="output JSONL path (default: stdout)")
    ap.add_argument("--weight", default="")
    ap.add_argument("--classes", default="")
    ap.add_argument("--data_root", default="")
    ap.add_argument("--clip_ckpt", default="")
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--top_k", type=int, default=5)
    ap.add_argument("--probs", action="store_true",
                    help="include the full probability row per input")
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--prune_tokens", type=int, default=0)
    ap.add_argument("--data_parallel", action="store_true")
    ap.add_argument("--tta", action="store_true",
                    help="4-variant event TTA (4x compute, averaged probs)")
    ap.add_argument("--embed_out", default="",
                    help="switch to embedding extraction: write one npz "
                         "(paths [N], embeddings [N, C] f32 L2-normalized) "
                         "instead of prediction JSONL — a retrieval index "
                         "over the recordings")
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from .server import resolve_class_names
    from .utils.config import load_params

    paths = sorted(globlib.glob(args.inputs, recursive=True))
    if not paths:
        raise SystemExit(f"no files match {args.inputs!r}")
    if bool(args.params) == bool(args.from_export):
        ap.error("pass exactly one of --params or --from_export")
    if args.from_export:
        baked = {"--weight": args.weight, "--classes": args.classes,
                 "--data_root": args.data_root,
                 "--clip_ckpt": args.clip_ckpt, "--int8": args.int8,
                 "--prune_tokens": args.prune_tokens,
                 "--data_parallel": args.data_parallel, "--tta": args.tta,
                 "--embed_out": args.embed_out, "--smoke": args.smoke}
        offending = [k for k, v in baked.items() if v]
        if args.batch_size != ap.get_default("batch_size"):
            offending.append("--batch_size")
        if offending:
            ap.error(f"{' '.join(offending)}: baked into the bundle at "
                     "export time — re-export to change them")
        from .export import ExportedPredictor

        pred = ExportedPredictor(args.from_export)
        names = pred.class_names
    else:
        params = load_params(args.params)
        names = resolve_class_names(params, args.classes, args.data_root)
        pred = Predictor(params, names, weight=args.weight,
                         clip_ckpt=args.clip_ckpt or None, smoke=args.smoke,
                         int8=args.int8, prune_tokens=args.prune_tokens,
                         batch_size=args.batch_size,
                         data_parallel=args.data_parallel, tta=args.tta,
                         embed=bool(args.embed_out))

    def load(p):
        # a bad file mid-glob must name itself, not abort a long run
        # with a bare KeyError/ValueError traceback
        try:
            return load_event_file(p)
        except Exception as err:
            raise SystemExit(f"error: {p}: {err}") from None

    if args.embed_out:
        # embedding-index mode: no JSONL, one npz with aligned rows
        feats = []
        for i in range(0, len(paths), pred.batch_size):
            chunk = paths[i:i + pred.batch_size]
            feats.append(pred.embed([load(p) for p in chunk]))
            print(f"{min(i + pred.batch_size, len(paths))}/{len(paths)}",
                  file=sys.stderr, flush=True)
        np.savez(args.embed_out, paths=np.array(paths),
                 embeddings=np.concatenate(feats))
        print(f"wrote {len(paths)} embeddings -> {args.embed_out}",
              file=sys.stderr, flush=True)
        return

    sink = sys.stdout if args.out == "-" else open(args.out, "w")
    try:
        # chunk at the compiled batch so memory stays flat on huge globs
        for i in range(0, len(paths), pred.batch_size):
            chunk = paths[i:i + pred.batch_size]
            out = pred.predict([load(p) for p in chunk],
                               top_k=args.top_k)
            for j, p in enumerate(chunk):
                rec = {
                    "path": p,
                    "label": int(out["label"][j]),
                    "name": out["names"][j],
                    "topk": out["topk"][j].tolist(),
                    "topk_names": [names[t] for t in out["topk"][j]],
                }
                if args.probs:
                    rec["probs"] = out["probs"][j].tolist()
                sink.write(json.dumps(rec) + "\n")
            sink.flush()
            print(f"{min(i + pred.batch_size, len(paths))}/{len(paths)}",
                  file=sys.stderr, flush=True)
    finally:
        if sink is not sys.stdout:
            sink.close()


if __name__ == "__main__":
    main()
