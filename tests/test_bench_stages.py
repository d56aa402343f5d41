"""Smoke-execute bench.py's composite stages on CPU (tiny geometry).

bench.py runs unattended at round end on the real chip; a crash there
loses the whole artifact. These tests drive the two composite stages
(feed/compute overlap, packed-vs-padded eval) end to end with a tiny
tower so any API drift in the stage code surfaces in CI, not on the TPU.
The numbers produced here are meaningless — only execution is asserted.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import bench


def test_feed_overlap_stage_smoke(monkeypatch):
    monkeypatch.setenv("BENCH_OVERLAP_ARCH", "ViT-T/8@32")
    monkeypatch.setenv("BENCH_OVERLAP_H", "48")
    monkeypatch.setenv("BENCH_OVERLAP_W", "64")
    monkeypatch.setenv("BENCH_OVERLAP_N", "256")
    monkeypatch.setenv("BENCH_OVERLAP_BATCH", "4")
    monkeypatch.setenv("BENCH_OVERLAP_ITERS", "2")
    b = bench.Bench(repeats=1)
    bench._feed_overlap(b)
    metrics = {r["metric"] for r in b.records}
    assert {
        "nin_lora_feed_ms", "nin_lora_step_ms",
        "nin_lora_loop_serialized_ms", "nin_lora_loop_prefetch_ms",
        "nin_lora_loop_auto_ms",
    } <= metrics
    auto = next(r for r in b.records
                if r["metric"] == "nin_lora_loop_auto_ms")
    assert "depth 1" in auto["note"] or "depth 2" in auto["note"]
    assert all(np.isfinite(r["value"]) and r["value"] > 0
               for r in b.records)


def test_packed_eval_stage_smoke(monkeypatch):
    from eventclip_tpu.models.classifier import (
        ClassifierConfig,
        init_classifier_params,
    )
    from eventclip_tpu.models.clip.config import clip_arch_config
    from eventclip_tpu.ops.preprocess import ClipPreprocess
    from eventclip_tpu.ops.rasterize import RasterSpec

    monkeypatch.setenv("BENCH_EVAL_BATCH", "4")
    monkeypatch.setenv("BENCH_EVAL_ITERS", "2")
    clip_cfg = clip_arch_config("ViT-T/8@32")
    cfg = ClassifierConfig(model="ZSCLIP", clip=clip_cfg,
                           dtype=jnp.float32)
    params = init_classifier_params(jax.random.PRNGKey(0), cfg, n_classes=5)
    H, W, N = 48, 64, 256
    spec = RasterSpec(height=H, width=W, window=N)
    pp = ClipPreprocess(in_height=H, in_width=W,
                        image_size=clip_cfg.vision.image_size)
    b = bench.Bench(repeats=1)
    bench._packed_eval(b, cfg, params, spec, pp, N)
    metrics = {r["metric"] for r in b.records}
    assert {"eval_ragged_padded_samples_per_sec",
            "eval_ragged_packed_samples_per_sec"} <= metrics
    assert all(np.isfinite(r["value"]) and r["value"] > 0
               for r in b.records)


def test_serve_latency_stage_smoke(monkeypatch):
    monkeypatch.setenv("BENCH_SERVE_CONFIG",
                       "configs/debug/fsclip_tiny_params.py")
    monkeypatch.setenv("BENCH_SERVE_EVENTS", "2000")
    monkeypatch.setenv("BENCH_SERVE_ITERS", "2")
    monkeypatch.setenv("BENCH_SERVE_BATCH", "4")
    b = bench.Bench(repeats=1)
    rng = np.random.default_rng(0)
    bench._serve_latency(b, rng, "ViT-T/8@32")
    metrics = {r["metric"] for r in b.records}
    assert {"serve_latency_p50_ms",
            "serve_throughput_streams_per_sec"} <= metrics
    assert all(np.isfinite(r["value"]) and r["value"] > 0
               for r in b.records)


def test_probe_wait_retries_wedge_then_recovers(monkeypatch):
    """The round-end probe must ride out a transient relay wedge: wedge
    signatures retry inside the BENCH_PROBE_WAIT_S budget, recovery ends
    the loop, and non-wedge failures (env problems) return immediately."""
    calls = []
    answers = ["tiny-matmul probe timed out after 180s — relay wedged",
               "tiny-matmul probe timed out after 180s — relay wedged",
               None]
    monkeypatch.setattr(bench, "_device_alive",
                        lambda: calls.append(1) or answers[len(calls) - 1])
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setenv("BENCH_PROBE_WAIT_S", "1200")
    diagnosis, retries = bench._device_alive_with_wait()
    assert diagnosis is None
    assert retries == 2  # feeds the post-wedge degraded-window cooldown
    assert len(calls) == 3

    calls.clear()
    answers[:] = ["tiny-matmul probe exited 1 (NOT a wedge — fix the "
                  "environment): ImportError"]
    diagnosis, retries = bench._device_alive_with_wait()
    assert "NOT a wedge" in diagnosis and retries == 0
    assert len(calls) == 1

    calls.clear()
    answers[:] = ["tiny-matmul probe timed out after 180s — relay wedged"]
    monkeypatch.setenv("BENCH_PROBE_WAIT_S", "0")
    diagnosis, retries = bench._device_alive_with_wait()
    assert "relay wedged" in diagnosis and retries == 0
    assert len(calls) == 1


def test_refresh_generated_prose_stdout_clean(capsys):
    """The canonical-run prose refresh must write nothing to stdout (the
    bench contract is one JSON line) and leave an already-current
    BASELINE.md/README.md byte-identical."""
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = [os.path.join(repo, n) for n in ("BASELINE.md", "README.md")]
    if not os.path.exists(os.path.join(repo, "BENCH_STAGES.json")):
        import pytest

        pytest.skip("no canonical BENCH_STAGES.json on this host")
    before = [open(p).read() for p in paths]
    bench._refresh_generated_prose()
    out = capsys.readouterr().out
    assert out == "", f"stdout polluted: {out!r}"
    after = [open(p).read() for p in paths]
    assert after == before  # spans were already current


def test_post_wedge_cooldown(monkeypatch):
    """A probe that retried through a wedge must cool down before the
    stages (the chip serves ~15 min of silently degraded perf after a
    wedge clears) and stamp the run's conditions; a clean probe must not
    sleep at all."""
    slept = []
    monkeypatch.setattr(bench.time, "sleep", lambda s: slept.append(s))

    assert bench._post_wedge_cooldown(0) == ""
    assert slept == []

    note = bench._post_wedge_cooldown(3)
    assert slept == [600.0]
    assert "3 probe retries" in note and "cooldown" in note

    slept.clear()
    monkeypatch.setenv("BENCH_RECOVERY_COOLDOWN_S", "0")
    note = bench._post_wedge_cooldown(2)
    assert slept == []  # cooldown disabled: no sleep, but the artifact
    assert "degraded window" in note  # must still say how it was measured
