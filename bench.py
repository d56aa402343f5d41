"""Benchmark: the event->CLIP-input pipeline plus end-to-end prediction.

Primary metric (the north star in BASELINE.json, "events/sec event2img"):
how fast raw event windows become CLIP-ready image tensors. The reference
does this on the host inside DataLoader workers — numpy bincount histograms
+ hot-pixel removal + colorize/composite (datasets/vis.py:75-117), then PIL
bicubic resize/crop + normalization (the clip.load transforms). The baseline
below measures exactly that host pipeline on this machine (same math,
single worker). Ours is the fused on-device program
(ops/rasterize.py::rasterize_for_clip) on one TPU chip.

Also measured and printed to stderr: end-to-end events -> prediction
throughput (pipeline + CLIP ViT-L/14 bf16 encode + aggregation) on the same
chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def make_event_batch(rng, B, T, N, H, W):
    xs = rng.integers(0, W, size=(B, T, N, 1))
    ys = rng.integers(0, H, size=(B, T, N, 1))
    ts = np.sort(rng.random(size=(B, T, N, 1)), axis=2)
    ps = rng.choice([-1.0, 1.0], size=(B, T, N, 1))
    return np.concatenate([xs, ys, ts, ps], axis=-1).astype(np.float32)


def host_baseline_events_per_sec(rng, H, W, N, image_size, n_windows=6) -> float:
    """The reference's per-worker host pipeline: numpy rasterize + PIL
    bicubic resize/crop + normalize (datasets/vis.py + clip preprocess)."""
    from PIL import Image

    from eventclip_tpu.ops.numpy_ref import events_to_frames_np
    from eventclip_tpu.ops.preprocess import CLIP_MEAN, CLIP_STD

    stream = make_event_batch(rng, 1, 1, N * n_windows, H, W)[0, 0]
    mean = np.array(CLIP_MEAN, np.float32)
    std = np.array(CLIP_STD, np.float32)

    def pipeline():
        frames = events_to_frames_np(stream, N, (H, W))
        out = []
        for f in frames:
            img = Image.fromarray(f)
            w, h = img.size
            if h <= w:
                nh, nw = image_size, int(image_size * w / h)
            else:
                nh, nw = int(image_size * h / w), image_size
            img = img.resize((nw, nh), Image.BICUBIC)
            left = int(round((nw - image_size) / 2.0))
            top = int(round((nh - image_size) / 2.0))
            img = img.crop((left, top, left + image_size, top + image_size))
            x = np.asarray(img).astype(np.float32) / 255.0
            out.append(((x - mean) / std).transpose(2, 0, 1))
        return np.stack(out)

    pipeline()  # warmup
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        pipeline()
    dt = time.perf_counter() - t0
    return N * n_windows * reps / dt


def main():
    import jax

    # amortize the (remote) TPU compile across bench invocations
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from eventclip_tpu.models.classifier import (
        ClassifierConfig,
        classifier_forward,
        init_classifier_params,
    )
    from eventclip_tpu.models.clip.config import clip_arch_config
    from eventclip_tpu.ops.preprocess import ClipPreprocess
    from eventclip_tpu.ops.rasterize import RasterSpec, rasterize_for_clip

    H, W, N = 180, 240, 20000
    B = int(os.environ.get("BENCH_BATCH", "32"))
    T = int(os.environ.get("BENCH_VIEWS", "2"))
    arch = os.environ.get("BENCH_ARCH", "ViT-L/14")
    iters = int(os.environ.get("BENCH_ITERS", "10"))

    clip_cfg = clip_arch_config(arch)
    cfg = ClassifierConfig(model="ZSCLIP", clip=clip_cfg, dtype=jnp.bfloat16)
    params = jax.device_put(
        init_classifier_params(jax.random.PRNGKey(0), cfg, n_classes=101)
    )
    spec = RasterSpec(height=H, width=W, window=N)
    pp = ClipPreprocess(in_height=H, in_width=W,
                        image_size=clip_cfg.vision.image_size)

    rng = np.random.default_rng(0)
    windows = jnp.asarray(make_event_batch(rng, B, T, N, H, W))
    valid = jnp.ones((B, T), dtype=bool)

    # --- stage 1: event2img (the reference's DataLoader-worker stage) ------
    pipe = jax.jit(lambda w: rasterize_for_clip(spec, pp, w))
    float(pipe(windows).sum())  # compile+warmup (host fetch = real sync)
    float(pipe(windows).sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        imgs = pipe(windows)
    float(imgs.sum())
    dt = time.perf_counter() - t0
    event2img_rate = B * T * N * iters / dt

    # --- end-to-end: events -> prediction ----------------------------------
    @jax.jit
    def e2e(params, windows, valid):
        x = rasterize_for_clip(spec, pp, windows)
        return classifier_forward(params, cfg, x, valid)["probs"]

    float(e2e(params, windows, valid).sum())
    float(e2e(params, windows, valid).sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = e2e(params, windows, valid)
    float(out.sum())
    dt = time.perf_counter() - t0
    e2e_events = B * T * N * iters / dt
    e2e_imgs = B * T * iters / dt

    baseline = host_baseline_events_per_sec(
        rng, H, W, N, clip_cfg.vision.image_size
    )

    print(
        f"[bench] event2img (N={N}, {H}x{W} -> {clip_cfg.vision.image_size}^2): "
        f"ours {event2img_rate:,.0f} events/s on-device vs reference host "
        f"pipeline {baseline:,.0f} events/s/worker "
        f"({event2img_rate / baseline:,.1f}x). "
        f"End-to-end incl. {arch} encode: {e2e_events:,.0f} events/s "
        f"({e2e_imgs:,.1f} img/s) on one chip.",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "event2img_events_per_sec",
        "value": round(event2img_rate, 1),
        "unit": "events/s",
        "vs_baseline": round(event2img_rate / baseline, 3),
    }))


if __name__ == "__main__":
    main()
