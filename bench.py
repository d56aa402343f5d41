"""End-to-end benchmark: events -> frames -> CLIP ViT-L/14 -> prediction.

Measures the on-device pipeline (rasterize + CLIP preprocess + ViT-L/14
visual tower in bf16 + classifier aggregation) in events/sec on one chip,
N-Caltech101 geometry (180x240, N=20000 events/window — the reference's
quantize_args, configs/zsclip/zsclip_ncaltech_params.py).

Baseline for `vs_baseline`: the reference computes frames on the host with
numpy inside DataLoader workers (datasets/vis.py:75-117) — its events/sec
ceiling is the host rasterization rate, measured here with the same-semantics
numpy oracle on this machine (single worker; the reference uses ~8, so the
printed ratio is conservative by ~(CLIP-GPU-rate / 8x-host-rate) factors).

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


def host_baseline_events_per_sec(rng, H, W, N, n_windows=8) -> float:
    """Reference-semantics numpy rasterization rate on this host."""
    from eventclip_tpu.ops.numpy_ref import events_to_frames_np

    stream = make_event_batch(rng, 1, 1, N * n_windows, H, W)[0, 0]
    # warmup
    events_to_frames_np(stream[: 2 * N], N, (H, W))
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        events_to_frames_np(stream, N, (H, W))
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
    B = int(os.environ.get("BENCH_BATCH", "16"))
    T = int(os.environ.get("BENCH_VIEWS", "2"))
    arch = os.environ.get("BENCH_ARCH", "ViT-L/14")

    clip_cfg = clip_arch_config(arch)
    cfg = ClassifierConfig(model="ZSCLIP", clip=clip_cfg, dtype=jnp.bfloat16)
    params = init_classifier_params(
        jax.random.PRNGKey(0), cfg, n_classes=101
    )
    params = jax.device_put(params)
    spec = RasterSpec(height=H, width=W, window=N)
    pp = ClipPreprocess(in_height=H, in_width=W,
                        image_size=clip_cfg.vision.image_size)

    @jax.jit
    def pipeline(params, windows, valid):
        imgs = rasterize_for_clip(spec, pp, windows)
        return classifier_forward(params, cfg, imgs, valid)["probs"]

    rng = np.random.default_rng(0)
    windows = jnp.asarray(make_event_batch(rng, B, T, N, H, W))
    valid = jnp.ones((B, T), dtype=bool)

    # compile + warmup; sync via host fetch (block_until_ready does not
    # round-trip through the axon relay)
    float(pipeline(params, windows, valid).sum())
    float(pipeline(params, windows, valid).sum())

    iters = int(os.environ.get("BENCH_ITERS", "10"))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = pipeline(params, windows, valid)
    float(out.sum())  # device executions are ordered; fetching the last syncs all
    dt = time.perf_counter() - t0

    events_per_sec = B * T * N * iters / dt
    images_per_sec = B * T * iters / dt
    baseline = host_baseline_events_per_sec(rng, H, W, N)

    print(
        f"[bench] {arch} B={B} T={T} N={N}: {events_per_sec:,.0f} events/s "
        f"({images_per_sec:,.1f} img/s incl. rasterize+preprocess+encode; "
        f"host-numpy rasterize-only baseline {baseline:,.0f} events/s)",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "e2e_events_to_prediction_throughput",
        "value": round(events_per_sec, 1),
        "unit": "events/s",
        "vs_baseline": round(events_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    main()
