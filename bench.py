"""Benchmark: the event->CLIP pipeline, encoders, and train steps on TPU.

Primary metric (the north star in BASELINE.json, "events/sec event2img"):
how fast raw event windows become CLIP-ready image tensors. The reference
does this on the host inside DataLoader workers — numpy bincount histograms
+ hot-pixel removal + colorize/composite (datasets/vis.py:75-117), then PIL
bicubic resize/crop + normalization (the clip.load transforms). The baseline
below measures exactly that host pipeline on this machine (same math,
single worker). Ours is the fused on-device program
(ops/rasterize.py::rasterize_for_clip) on one TPU chip.

Also measured, reported per stage to stderr and BENCH_STAGES.json:
  - rasterize-only (events -> uint8 frames, no CLIP preprocess)
  - CLIP ViT-L/14 bf16 encode
  - FSCLIP joint-adapter train step WITH on-device RandAugment (img_aug=True,
    the flagship training config's real step)
  - FTCLIP LoRA-16 train step
  - end-to-end events -> prediction

Timing protocol: every stage is timed as the best of `BENCH_REPEATS` windows
of `iters` dispatches each, synced by a host fetch (`float(x.sum())`) —
`jax.block_until_ready` is a no-op through the remote-TPU relay, and
single-window timing is vulnerable to transient relay stalls (the round-1
driver capture hit one: 89M events/s vs the 220M this machine reproduces).

Prints ONE JSON line to stdout: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
import sys
import time

import numpy as np

STAGES_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_STAGES.json")
HISTORY_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_HISTORY.jsonl")


def write_stage_artifacts(records, path):
    """Write the per-stage JSONL artifact; a CANONICAL run (default arch +
    full level + no geometry overrides, i.e. ``path == STAGES_PATH``) also
    appends one record to the cross-run history so
    scripts/update_baseline.py can regenerate BASELINE.md's quoted results
    from artifacts instead of hand-kept prose."""
    with open(path, "w") as f:
        for rec in records:
            f.write(json.dumps(rec) + "\n")
    if path == STAGES_PATH:
        with open(HISTORY_PATH, "a") as f:
            f.write(json.dumps({
                "ts": round(time.time(), 1),
                "stages": {r["metric"]: r["value"] for r in records},
            }) + "\n")


def _refresh_generated_prose():
    """After a CANONICAL run rewrote BENCH_STAGES.json/BENCH_HISTORY,
    immediately regenerate the gen spans in BASELINE.md/README.md so the
    committed prose can never lag a driver-run bench (rounds 2-4 each
    shipped envelopes one artifact behind; the prose test then fails for
    whoever reads the repo next). Prints to stderr — bench's stdout
    contract is ONE JSON line — and never fails the run over prose."""
    import contextlib

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "scripts"))
    try:
        import update_baseline

        with contextlib.redirect_stdout(sys.stderr):
            update_baseline.main()
    except Exception as err:  # artifact stands on its own either way
        print(f"# update_baseline failed (regenerate by hand): {err}",
              file=sys.stderr)
    finally:
        sys.path.pop(0)


def make_event_batch(rng, B, T, N, H, W):
    xs = rng.integers(0, W, size=(B, T, N, 1))
    ys = rng.integers(0, H, size=(B, T, N, 1))
    ts = np.sort(rng.random(size=(B, T, N, 1)), axis=2)
    ps = rng.choice([-1.0, 1.0], size=(B, T, N, 1))
    return np.concatenate([xs, ys, ts, ps], axis=-1).astype(np.float32)


def make_packed_event_batch(rng, B, T, N, H, W):
    """[B, T, N, 3] int16 (x, y, p) — the production loader's H2D layout."""
    win = np.zeros((B, T, N, 3), np.int16)
    win[..., 0] = rng.integers(0, W, size=(B, T, N))
    win[..., 1] = rng.integers(0, H, size=(B, T, N))
    win[..., 2] = rng.choice(np.array([-1, 1], np.int16), size=(B, T, N))
    return win


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


class Bench:
    def __init__(self, repeats: int):
        self.repeats = repeats
        self.records = []

    def run(self, dispatch, sync, iters: int) -> float:
        """Best-of-`repeats` seconds for `iters` dispatches + one sync."""
        sync(dispatch())  # compile + warm
        sync(dispatch())
        best = float("inf")
        for _ in range(self.repeats):
            t0 = time.perf_counter()
            out = None
            for _ in range(iters):
                out = dispatch()
            sync(out)
            best = min(best, time.perf_counter() - t0)
        return best / iters

    def record(self, metric, value, unit, note=""):
        rec = {"metric": metric, "value": round(float(value), 3),
               "unit": unit}
        if note:
            rec["note"] = note
        self.records.append(rec)
        print(f"[bench] {metric}: {value:,.1f} {unit}  {note}",
              file=sys.stderr)
        return rec


def _sync(x):
    # device-side reduce + scalar fetch = the only real sync through the
    # axon relay (block_until_ready is a no-op there, and fetching a full
    # tensor would time the tunnel bandwidth, not the device)
    float(x.sum())


def main(run_conditions: str = ""):
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
    from eventclip_tpu.models.clip.model import encode_image
    from eventclip_tpu.ops.preprocess import ClipPreprocess
    from eventclip_tpu.ops.rasterize import (
        RasterSpec,
        rasterize_for_clip,
        rasterize_windows,
    )

    H, W, N = 180, 240, 20000
    B = int(os.environ.get("BENCH_BATCH", "32"))
    T = int(os.environ.get("BENCH_VIEWS", "2"))
    arch = os.environ.get("BENCH_ARCH", "ViT-L/14")
    iters = int(os.environ.get("BENCH_ITERS", "10"))
    level = os.environ.get("BENCH_LEVEL", "full")  # full | quick
    bench = Bench(repeats=int(os.environ.get("BENCH_REPEATS", "3")))
    if run_conditions:
        # self-describing artifact: a run that started near a wedge
        # recovery says so, so nobody reads its serving rows as a
        # code regression (value 1.0 = flag present)
        bench.record("bench_run_conditions", 1.0, "flag", run_conditions)

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
    events_per_batch = B * T * N

    # --- stage 1: event2img (the reference's DataLoader-worker stage) ------
    pipe = jax.jit(lambda w: rasterize_for_clip(spec, pp, w))
    dt = bench.run(lambda: pipe(windows), _sync, iters)
    event2img_rate = events_per_batch / dt
    bench.record("event2img_events_per_sec", event2img_rate, "events/s",
                 f"B={B} T={T} N={N} {H}x{W}->{clip_cfg.vision.image_size}^2")

    # --- stage 2: rasterize only (events -> uint8 frames) ------------------
    rast = jax.jit(lambda w: rasterize_windows(spec, w))
    dt = bench.run(lambda: rast(windows), _sync, iters)
    bench.record("rasterize_events_per_sec", events_per_batch / dt,
                 "events/s", f"B={B} T={T} N={N} frames only")

    # --- stage 2b: achievable MXU ceiling (context for the encode stage) ----
    # 8 chained 4096^3 bf16 matmuls: one dispatch, compute-bound — the
    # highest sustained matmul rate this chip+runtime combination reaches.
    mk = 4096
    ma = jnp.asarray(rng.normal(size=(mk, mk)), dtype=jnp.bfloat16)

    def _chain(a):
        x = a
        for _ in range(8):
            x = jax.lax.dot_general(x, a, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.bfloat16)
        return x

    chain = jax.jit(_chain)
    dt = bench.run(lambda: chain(ma), _sync, iters)
    mxu_tflops = 8 * 2 * mk**3 / dt / 1e12
    bench.record("mxu_ceiling_tflops", mxu_tflops, "TFLOP/s",
                 "8x chained 4096^3 bf16 matmul (achievable, not paper peak)")

    mi = jnp.asarray(rng.integers(-127, 127, size=(mk, mk)), dtype=jnp.int8)

    def _chain_i8(a):
        x = a
        for _ in range(8):
            y = jax.lax.dot_general(x, a, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            x = jnp.clip(y >> 8, -127, 127).astype(jnp.int8)
        return x

    chain_i8 = jax.jit(_chain_i8)
    dt = bench.run(lambda: chain_i8(mi), lambda x: _sync(x.astype(jnp.int32)),
                   iters)
    bench.record("mxu_int8_ceiling_tops", 8 * 2 * mk**3 / dt / 1e12, "TOP/s",
                 "8x chained 4096^3 int8 matmul (the --int8 path's ceiling)")

    # --- stage 3: CLIP encode (bf16 forward) --------------------------------
    eB = int(os.environ.get("BENCH_ENC_BATCH", "64"))
    imgs = jnp.asarray(rng.normal(size=(
        eB, 3, clip_cfg.vision.image_size, clip_cfg.vision.image_size
    )).astype(np.float32))
    if getattr(clip_cfg.vision, "patch_size", 0):
        enc = jax.jit(lambda p, x: encode_image(
            p, clip_cfg.vision, x, dtype=jnp.bfloat16))
    else:  # BENCH_ARCH=RN50 etc.
        from eventclip_tpu.models.clip.resnet import encode_image_resnet

        enc = jax.jit(lambda p, x: encode_image_resnet(
            p, clip_cfg.vision, x, dtype=jnp.bfloat16))
    visual = params["clip"]["visual"]
    dt = bench.run(lambda: enc(visual, imgs), _sync, iters)
    v = clip_cfg.vision
    if getattr(v, "patch_size", 0):  # ViT: qkv + scores/av + out + mlp / layer
        S = (v.image_size // v.patch_size) ** 2 + 1
        gf = v.layers * (2 * S * v.width * 3 * v.width + 4 * S * S * v.width
                         + 2 * S * v.width * v.width
                         + 4 * S * v.width * 4 * v.width) / 1e9
        mfu = f"; {eB * gf / dt / 1e3:.0f} TFLOP/s vs {mxu_tflops:.0f} ceiling"
    else:
        mfu = ""
    bench.record(f"encode_{arch.replace('/', '')}_img_per_sec", eB / dt,
                 "img/s", f"bf16 B={eB}{mfu}")

    # --- stage 4: end-to-end events -> prediction ---------------------------
    @jax.jit
    def e2e(p, w, v):
        x = rasterize_for_clip(spec, pp, w)
        return classifier_forward(p, cfg, x, v)["probs"]

    dt = bench.run(lambda: e2e(params, windows, valid), _sync, iters)
    e2e_events = events_per_batch / dt
    e2e_imgs = B * T / dt
    bench.record("e2e_events_per_sec", e2e_events, "events/s",
                 f"incl. {arch} encode; {e2e_imgs:,.1f} img/s")

    # --- stage 3b/4b: W8A8 int8 inference (opt-in eval path, --int8) --------
    if getattr(clip_cfg.vision, "patch_size", 0):
        from eventclip_tpu.ops.quant import (
            quantize_classifier_params,
            quantize_visual,
        )

        qvisual = quantize_visual(visual)
        dt = bench.run(lambda: enc(qvisual, imgs), _sync, iters)
        bench.record(f"encode_int8_{arch.replace('/', '')}_img_per_sec",
                     eB / dt, "img/s", f"W8A8 B={eB}")

        # calibrated static activation scales (--int8 --int8_calib N):
        # drops the per-token max-abs reduce from the hot loop
        from eventclip_tpu.ops.quant import calibrate_visual_amax

        amax = calibrate_visual_amax(visual, clip_cfg.vision, imgs,
                                     dtype=jnp.bfloat16)
        qsvisual = quantize_visual(visual, act_amax=amax)
        dt = bench.run(lambda: enc(qsvisual, imgs), _sync, iters)
        bench.record(f"encode_int8_static_{arch.replace('/', '')}_img_per_sec",
                     eB / dt, "img/s",
                     f"W8A8 + calibrated static act scales B={eB}")
        qparams = quantize_classifier_params(params)
        dt = bench.run(lambda: e2e(qparams, windows, valid), _sync, iters)
        bench.record("e2e_int8_events_per_sec", events_per_batch / dt,
                     "events/s", f"--int8 eval path; {B * T / dt:,.1f} img/s")

        # --- stage 4c: fast path (--int8 --prune_tokens) ------------------
        # default: keep half the patch tokens; a K >= grid^2 would silently
        # measure the unpruned path under a pruned label
        K = int(os.environ.get("BENCH_PRUNE",
                               str(clip_cfg.vision.grid ** 2 // 2)))
        pcfg = dataclasses.replace(cfg, keep_tokens=K)

        @jax.jit
        def e2e_fast(p, w, v):
            x = rasterize_for_clip(spec, pp, w)
            return classifier_forward(p, pcfg, x, v)["probs"]

        dt = bench.run(lambda: e2e_fast(qparams, windows, valid), _sync,
                       iters)
        bench.record("e2e_int8_prune_events_per_sec", events_per_batch / dt,
                     "events/s",
                     f"--int8 --prune_tokens {K} (of "
                     f"{clip_cfg.vision.grid ** 2}); {B * T / dt:,.1f} img/s")

    # --- stage 4d: pseudo-label teacher (gen_data.py's TTA forward) --------
    # the heaviest inference job in the reference workflow: the full
    # training split x 4 TTA flip variants through the teacher tower
    # (reference gen_data.py:69-280); gen_data.py shards this same jit over
    # the data mesh, so per-chip throughput is what this stage pins
    tB = max(B // 2, 1)
    wt = jnp.asarray(make_event_batch(rng, tB * 4, T, N, H, W)).reshape(
        (tB, 4, T, N, 4))
    vt = jnp.ones((tB, 4, T), dtype=bool)

    @jax.jit
    def teacher(p, w, v):
        flat_w = w.reshape((-1,) + w.shape[-3:])
        flat_v = v.reshape((-1,) + v.shape[-1:])
        x = rasterize_for_clip(spec, pp, flat_w)
        out = classifier_forward(p, cfg, x, flat_v)
        return out["probs"].reshape(w.shape[:2] + (-1,))

    dt = bench.run(lambda: teacher(params, wt, vt), _sync, iters)
    bench.record("gen_data_teacher_samples_per_sec", tB / dt, "samples/s",
                 f"4-way TTA teacher forward (gen_data.py), {arch} "
                 f"B={tB} T={T}; {4 * tB * T / dt:,.1f} img/s")

    if level == "full":
        _packed_eval(bench, cfg, params, spec, pp, N)
        _train_steps(bench, rng, spec, pp, clip_cfg, H, W, N)
        _nin_input_feed(bench, rng)
        _host_item_pipeline(bench)
        _feed_overlap(bench)
        _serve_latency(bench, rng, arch)

    baseline = host_baseline_events_per_sec(
        rng, H, W, N, clip_cfg.vision.image_size
    )
    bench.record("host_pipeline_events_per_sec", baseline, "events/s",
                 "reference DataLoader-worker pipeline, 1 worker")

    # non-default invocations (other arch / quick level / any overridden
    # stage geometry) write a suffixed artifact so they never clobber the
    # canonical full-run stage record under the canonical metric names
    path = STAGES_PATH
    custom = any(
        os.environ.get(k)
        for k in ("BENCH_OVERLAP_ARCH", "BENCH_OVERLAP_H", "BENCH_OVERLAP_W",
                  "BENCH_OVERLAP_N", "BENCH_OVERLAP_BATCH",
                  "BENCH_EVAL_BATCH", "BENCH_NIN_BATCH",
                  "BENCH_TRAIN_BATCH", "BENCH_BATCH", "BENCH_VIEWS",
                  "BENCH_SERVE_CONFIG", "BENCH_SERVE_EVENTS",
                  "BENCH_SERVE_BATCH", "BENCH_ENC_BATCH", "BENCH_PRUNE",
                  "BENCH_FS_B32", "BENCH_FT_FULL")
    )
    if arch != "ViT-L/14" or level != "full" or custom:
        suffix = f"-{arch.replace('/', '')}-{level}"
        if custom:
            suffix += "-custom"
        path = STAGES_PATH.replace(".json", suffix + ".json")
    write_stage_artifacts(bench.records, path)
    if path == STAGES_PATH:
        _refresh_generated_prose()

    print(json.dumps({
        "metric": "event2img_events_per_sec",
        "value": round(event2img_rate, 1),
        "unit": "events/s",
        "vs_baseline": round(event2img_rate / baseline, 3),
    }))


def _train_steps(bench, rng, spec, pp, clip_cfg, H, W, N):
    """FSCLIP (joint adapter + prompt tuning, img_aug=True) and FTCLIP
    (LoRA-16) train steps at the flagship config geometry (ViT-L/14, B=16,
    T=2 — configs/fsclip/joint_adapter/joint_fsclip_ncaltech_params.py)."""
    import jax
    import jax.numpy as jnp

    from eventclip_tpu.engine.optim import OptimConfig, build_optimizer
    from eventclip_tpu.engine.train import create_train_state, make_train_step
    from eventclip_tpu.models.adapter import AdapterConfig
    from eventclip_tpu.models.classifier import (
        ClassifierConfig,
        init_classifier_params,
    )
    from eventclip_tpu.parallel import make_mesh

    B = int(os.environ.get("BENCH_TRAIN_BATCH", "16"))
    T = 2
    iters = int(os.environ.get("BENCH_TRAIN_ITERS", "5"))
    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    windows = jnp.asarray(make_event_batch(rng, B, T, N, H, W))
    batch = {
        "windows": windows,
        "valid_mask": jnp.ones((B, T), dtype=bool),
        "label": jnp.asarray(rng.integers(0, 101, size=(B,)), jnp.int32),
    }
    batch = jax.device_put(batch)

    def bench_step(name, cfg, augment, note):
        params = jax.device_put(init_classifier_params(
            jax.random.PRNGKey(0), cfg, n_classes=101))
        tx = build_optimizer(cfg, OptimConfig(lr=1e-4, total_steps=1000),
                             params)
        state = create_train_state(params, tx, jax.random.PRNGKey(1))
        step = make_train_step(cfg, tx, mesh,
                               pipeline=(spec, pp), augment=augment)
        holder = {"state": state}

        def dispatch():
            holder["state"], metrics = step(holder["state"], batch)
            return metrics["total_loss"]

        dt = bench.run(dispatch, _sync, iters)
        bench.record(name, dt * 1e3, "ms/step", f"{note}; {B / dt:,.1f} img/s"
                     f" (B={B} T={T}, on-device rasterize included)")

    fs_cfg = ClassifierConfig(
        model="FSCLIP", clip=clip_cfg, dtype=jnp.bfloat16,
        adapter=AdapterConfig(adapter_type="trans", in_dim=clip_cfg.embed_dim,
                              d_model=256, num_heads=4, ffn_dim=1024,
                              num_layers=2, residual=0.8),
        prompt_tuning=True,
    )
    bench_step("fsclip_train_step_ms", fs_cfg, augment=False,
               note="joint adapter + prompts, no RandAugment")
    bench_step("fsclip_aug_train_step_ms", fs_cfg, augment=True,
               note="joint adapter + prompts, img_aug=True (RandAugment)")
    if B != 32 and os.environ.get("BENCH_FS_B32", "1") != "0":
        # the N-Caltech/N-Cars joint-adapter configs train at GLOBAL batch
        # 32 on one device — this row makes BASELINE.md directly comparable
        # to the configs it names (B=16 above stays for history)
        B = 32
        windows = jnp.asarray(make_event_batch(rng, B, T, N, H, W))
        batch = jax.device_put({
            "windows": windows,
            "valid_mask": jnp.ones((B, T), dtype=bool),
            "label": jnp.asarray(rng.integers(0, 101, size=(B,)), jnp.int32),
        })
        bench_step("fsclip_train_step_b32_ms", fs_cfg, augment=True,
                   note="joint adapter + prompts, img_aug=True, config "
                        "global batch")
        B = int(os.environ.get("BENCH_TRAIN_BATCH", "16"))
        windows = jnp.asarray(make_event_batch(rng, B, T, N, H, W))
        batch = jax.device_put({
            "windows": windows,
            "valid_mask": jnp.ones((B, T), dtype=bool),
            "label": jnp.asarray(rng.integers(0, 101, size=(B,)), jnp.int32),
        })

    ft_cfg = ClassifierConfig(
        model="FTCLIP", clip=clip_cfg, dtype=jnp.bfloat16,
        lora="qkv-16", ft_mode="lora", prompt_tuning=True, remat=False,
    )
    bench_step("ftclip_lora_train_step_ms", ft_cfg, augment=False,
               note="LoRA-16")

    # on by default: BENCH_STAGES.json is rewritten wholesale each run and
    # BASELINE.md cites this row, so the default invocation must produce it
    # (BENCH_FT_FULL=0 skips it to save the extra ~2 min of compile)
    if os.environ.get("BENCH_FT_FULL", "1") != "0":
        full_cfg = ClassifierConfig(
            model="FTCLIP", clip=clip_cfg, dtype=jnp.bfloat16,
            ft_mode="full", remat=True,
        )
        bench_step("ftclip_full_train_step_ms", full_cfg, augment=False,
                   note="full fine-tune + remat")


def _nin_input_feed(bench, rng):
    """N-ImageNet-geometry input feed at the PER-CHIP batch (global 128 on
    4 devices in the reference's LoRA config,
    configs/ftclip/ft_text_fsclip_nin_params.py): packed int16 windows,
    rasterize+preprocess on device. Reported twice — device compute only,
    and with the host->device copy included. Note: this machine reaches the
    TPU through a ~47 MB/s relay tunnel, so the H2D-inclusive number is
    tunnel-bound here; on a real TPU host (PCIe >=10 GB/s) the 27 MB/step
    packed payload transfers in ~3 ms (the unpacked f32 [.., 4] layout
    would be 215 MB/step — the 8x cut is the point)."""
    import jax
    import jax.numpy as jnp

    from eventclip_tpu.ops.preprocess import ClipPreprocess
    from eventclip_tpu.ops.rasterize import RasterSpec, rasterize_for_clip

    H, W, N = 480, 640, 70000
    B = int(os.environ.get("BENCH_NIN_BATCH", "32"))
    T = 2
    spec = RasterSpec(height=H, width=W, window=N)
    pp = ClipPreprocess(in_height=H, in_width=W, image_size=224)

    win = make_packed_event_batch(np.random.default_rng(0), B, T, N, H, W)
    mb = win.nbytes / 1e6
    pipe = jax.jit(lambda w: rasterize_for_clip(spec, pp, w))

    dev = jnp.asarray(win)
    dt = bench.run(lambda: pipe(dev), _sync, iters=4)
    bench.record(
        "nin_event2img_ms_per_step", dt * 1e3, "ms/step",
        f"device compute only; N-IN geometry B={B} T={T} N={N} "
        f"{H}x{W}->224^2, {B * T * N / dt / 1e6:,.0f}M events/s",
    )

    step = [0]

    def dispatch():
        step[0] += 1
        win[0, 0, 0, 0] = step[0] % 3  # defeat host-buffer caching
        return pipe(jnp.asarray(win))

    dt = bench.run(dispatch, _sync, iters=2)
    bench.record(
        "nin_input_feed_ms_per_step", dt * 1e3, "ms/step",
        f"incl. H2D of {mb:.0f} MB/step packed int16 (relay-tunnel-bound "
        "on this machine; ~3 ms on real PCIe)",
    )


def _host_item_pipeline(bench):
    """Per-item host half of the loader (the work torch DataLoader workers
    do in the reference) at N-ImageNet geometry: npz member read +
    structured-record decode + center/augment + window pack. Measured on
    the numpy path vs the native fast path (eventclip_tpu/native fused
    kernels + datasets._read_npz_member). Host-only — no device involved."""
    import tempfile

    from eventclip_tpu import native
    from eventclip_tpu.data import host_ops
    from eventclip_tpu.data.datasets import load_event_npz

    rng = np.random.default_rng(0)
    H, W, N = 480, 640, 70000
    n = 600_000
    rec = np.zeros(n, dtype=[("x", "<u2"), ("y", "<u2"), ("t", "<i8"),
                             ("p", "?")])
    rec["x"] = rng.integers(0, W, n)
    rec["y"] = rng.integers(0, H, n)
    rec["t"] = np.sort(rng.integers(0, 60_000, n))
    rec["p"] = rng.random(n) < 0.5
    tmp = tempfile.NamedTemporaryFile(suffix=".npz", delete=False)
    np.savez(tmp, event_data=rec)
    tmp.close()

    def item():
        ev = load_event_npz(tmp.name)
        r = np.random.default_rng(1)
        out = host_ops.prepare_stream(ev, (H, W), rng=r, augment=True,
                                      flip_time=True, max_shift=20)
        return host_ops.gather_event_windows(out, N, 2, rng=r, packed=True)

    saved = os.environ.get("EVENTCLIP_NATIVE")
    saved_fast = os.environ.get("EVENTCLIP_NO_FAST_NPZ")
    try:
        for mode, flag in (("numpy", "0"), ("native", "1")):
            os.environ["EVENTCLIP_NATIVE"] = flag
            # the numpy column reproduces the reference-shaped baseline:
            # full np.load member read, not the raw-region fast path
            os.environ["EVENTCLIP_NO_FAST_NPZ"] = \
                "1" if mode == "numpy" else "0"
            native.reset_for_tests()
            if mode == "native" and not native.available():
                bench.record("host_item_native_events_per_sec", 0.0,
                             "events/s", "native library unavailable")
                continue
            # the numpy decode alone is ~240 ms/item; fewer iters keep the
            # stage bounded without hurting best-of-repeats stability
            dt = bench.run(item, lambda _: None,
                           iters=3 if mode == "numpy" else 10)
            bench.record(
                f"host_item_{mode}_events_per_sec", n / dt, "events/s",
                f"full item: npz read+decode+augment+pack, {n} ev -> "
                f"2x{N} packed; {dt * 1e3:.2f} ms/item",
            )
    finally:
        if saved is None:
            os.environ.pop("EVENTCLIP_NATIVE", None)
        else:
            os.environ["EVENTCLIP_NATIVE"] = saved
        if saved_fast is None:
            os.environ.pop("EVENTCLIP_NO_FAST_NPZ", None)
        else:
            os.environ["EVENTCLIP_NO_FAST_NPZ"] = saved_fast
        native.reset_for_tests()
        os.unlink(tmp.name)


def _packed_eval(bench, cfg, params, spec, pp, N):
    """Eval throughput at a realistic RAGGED view distribution.

    Val forces a view budget of 10 (reference datasets/__init__.py:23) but
    most samples carry fewer real windows; the padded eval forward encodes
    every slot anyway, the packed one (test.py / trainer.evaluate via
    data.loader.pack_view_batch) encodes only real views at a bucketed
    static K. Distribution here: half the samples with 5/10 valid views
    (75% occupancy -> packed should approach 4/3x padded; the reference's
    dynamic gather, clip_cls.py:139, never pays for padding at all)."""
    import jax
    import jax.numpy as jnp

    from eventclip_tpu.data.loader import pack_view_batch, view_pack_buckets
    from eventclip_tpu.models.classifier import (
        classifier_forward,
        classifier_forward_packed,
    )
    from eventclip_tpu.ops.rasterize import rasterize_for_clip

    B, T = int(os.environ.get("BENCH_EVAL_BATCH", "16")), 10
    H, W = spec.height, spec.width
    win = make_packed_event_batch(np.random.default_rng(1), B, T, N, H, W)
    valid = np.ones((B, T), dtype=bool)
    valid[::2, 5:] = False  # ragged: every other sample has 5 of 10 views

    @jax.jit
    def pad_step(p, w, v):
        x = rasterize_for_clip(spec, pp, w)
        return classifier_forward(p, cfg, x, v)["probs"]

    @jax.jit
    def pack_step(p, w, src, v):
        x = rasterize_for_clip(spec, pp, w)
        return classifier_forward_packed(p, cfg, x, src, v)["probs"]

    iters = int(os.environ.get("BENCH_EVAL_ITERS", "5"))
    wd, vd = jnp.asarray(win), jnp.asarray(valid)
    dt_pad = bench.run(lambda: pad_step(params, wd, vd), _sync, iters)
    bench.record("eval_ragged_padded_samples_per_sec", B / dt_pad,
                 "samples/s", f"B={B} T=10, half the samples 5/10 views, "
                 "all slots encoded")

    pb = pack_view_batch({"windows": win, "valid_mask": valid},
                         view_pack_buckets(B * T, align=8))
    K = pb["windows"].shape[0]
    pwd = jnp.asarray(pb["windows"])
    psd = jnp.asarray(pb["view_src"])
    dt_pack = bench.run(lambda: pack_step(params, pwd, psd, vd), _sync,
                        iters)
    bench.record("eval_ragged_packed_samples_per_sec", B / dt_pack,
                 "samples/s", f"K={K} of {B * T} views encoded; "
                 f"{dt_pad / dt_pack:.2f}x padded")


def _feed_overlap(bench):
    """Feed/compute overlap at the N-ImageNet LoRA train geometry.

    Four rows answer 'does the input feed serialize with the step?':
      - step-only (device-resident batch)
      - feed-only (H2D of the packed int16 windows)
      - serialized loop: place-then-dispatch each iteration
      - prefetched loop: data.loader.device_prefetch depth-2
    plus a fifth row, the auto loop (nin_lora_loop_auto_ms): what
    trainer.fit actually runs — data.loader.adaptive_prefetch probes both
    depths and keeps the measured winner (round-3 verdict: prefetch lost
    32% through the relay tunnel; it must never again be unconditional).
    Steady state for either loop should be ~max(feed, step), not
    feed+step. On this machine the feed is relay-tunnel-bound (CLAUDE.md);
    on a real TPU host the copy is ~3 ms and the loop collapses to the
    step row — these measurements replace that extrapolation with data.
    """
    import jax
    import jax.numpy as jnp

    from eventclip_tpu.data.loader import device_prefetch
    from eventclip_tpu.engine.optim import OptimConfig, build_optimizer
    from eventclip_tpu.engine.train import create_train_state, make_train_step
    from eventclip_tpu.models.classifier import (
        ClassifierConfig,
        init_classifier_params,
    )
    from eventclip_tpu.models.clip.config import clip_arch_config
    from eventclip_tpu.ops.preprocess import ClipPreprocess
    from eventclip_tpu.ops.rasterize import RasterSpec
    from eventclip_tpu.parallel import make_mesh

    # N-IN geometry + ViT-L/14 by default; env-overridable so the stage is
    # smoke-testable on CPU with a tiny tower (tests/test_bench_stages.py)
    H = int(os.environ.get("BENCH_OVERLAP_H", "480"))
    W = int(os.environ.get("BENCH_OVERLAP_W", "640"))
    N = int(os.environ.get("BENCH_OVERLAP_N", "70000"))
    # B=16 matches the recorded LoRA step row (BENCH_TRAIN_BATCH); B=32
    # (the reference's per-chip batch) OOMs the non-remat LoRA backward on
    # this chip's HBM and wedges the relay — don't raise it casually
    B = int(os.environ.get("BENCH_OVERLAP_BATCH", "16"))
    T = 2
    iters = int(os.environ.get("BENCH_OVERLAP_ITERS", "4"))
    spec = RasterSpec(height=H, width=W, window=N)
    clip_cfg = clip_arch_config(os.environ.get("BENCH_OVERLAP_ARCH",
                                               "ViT-L/14"))
    pp = ClipPreprocess(in_height=H, in_width=W,
                        image_size=clip_cfg.vision.image_size)
    cfg = ClassifierConfig(model="FTCLIP", clip=clip_cfg, dtype=jnp.bfloat16,
                           lora="qkv-16", ft_mode="lora", prompt_tuning=True,
                           remat=False)
    params = jax.device_put(
        init_classifier_params(jax.random.PRNGKey(0), cfg, n_classes=1000)
    )
    tx = build_optimizer(cfg, OptimConfig(lr=1e-4, total_steps=1000), params)
    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    step = make_train_step(cfg, tx, mesh, pipeline=(spec, pp))

    r = np.random.default_rng(0)
    win = make_packed_event_batch(r, B, T, N, H, W)
    valid = np.ones((B, T), dtype=bool)
    label = r.integers(0, 1000, size=(B,)).astype(np.int32)
    tick = [0]

    def host_batch():
        tick[0] += 1
        win[0, 0, 0, 0] = tick[0] % 3  # defeat host-buffer caching
        return {"windows": win, "valid_mask": valid, "label": label}

    place = jax.device_put

    # feed-only
    dt_feed = bench.run(lambda: place(host_batch())["windows"],
                        lambda x: _sync(x.astype(jnp.int32)), iters)
    mb = win.nbytes / 1e6
    bench.record("nin_lora_feed_ms", dt_feed * 1e3, "ms/step",
                 f"H2D only, {mb:.0f} MB packed int16 B={B} T={T}")

    # step-only (device-resident batch; state donated so keep a holder)
    dev = place(host_batch())
    holder = {"state": create_train_state(params, tx, jax.random.PRNGKey(1))}

    def dispatch_step():
        holder["state"], m = step(holder["state"], dev)
        return m["total_loss"]

    dt_step = bench.run(dispatch_step, _sync, iters)
    bench.record("nin_lora_step_ms", dt_step * 1e3, "ms/step",
                 "device-resident batch (compute only)")

    def serialized(n):
        out = None
        for _ in range(n):
            holder["state"], m = step(holder["state"], place(host_batch()))
            out = m["total_loss"]
        _sync(out)

    def prefetched(n):
        out = None
        for b in device_prefetch((host_batch() for _ in range(n)), place):
            holder["state"], m = step(holder["state"], b)
            out = m["total_loss"]
        _sync(out)

    # the loop trainer.fit actually runs: adaptive_prefetch A/Bs depth 2
    # vs 1 on the first steps, then sticks with the measured winner — the
    # steady state must track min(serialized, prefetch) within noise
    from eventclip_tpu.data.loader import adaptive_prefetch

    choice: dict = {}

    def adaptive(n):
        out = None
        for b in adaptive_prefetch((host_batch() for _ in range(n)),
                                   place, choice, warmup=1, probe=2):
            holder["state"], m = step(holder["state"], b)
            out = m["total_loss"]
        _sync(out)

    # INTERLEAVED reps: the relay link drifts by tens of percent over a
    # stage's duration, so timing the three variants back-to-back charges
    # whichever runs last with the drift (round-4 artifact: the auto loop
    # measured 472 ms after the same run's plain loop did 274 with the
    # same steady-state code). One rep of each variant per round + min
    # over rounds exposes every variant to the same link history.
    serialized(2)
    prefetched(2)
    adaptive(6)  # warm + decide depth once (warmup 1 + 2x2 probe)
    variants = (("serialized", serialized), ("prefetch", prefetched),
                ("auto", adaptive))
    best = {name: float("inf") for name, _ in variants}
    for _ in range(bench.repeats):
        for name, fn in variants:
            t0 = time.perf_counter()
            fn(iters)
            best[name] = min(best[name],
                             (time.perf_counter() - t0) / iters)

    bench.record("nin_lora_loop_serialized_ms", best["serialized"] * 1e3,
                 "ms/step", "place-then-dispatch per step (pre-double-"
                 "buffer loop); interleaved reps")
    bench.record(
        "nin_lora_loop_prefetch_ms", best["prefetch"] * 1e3, "ms/step",
        f"device_prefetch depth-2 loop; max(feed, step)="
        f"{max(dt_feed, dt_step) * 1e3:,.1f} ms, feed+step="
        f"{(dt_feed + dt_step) * 1e3:,.1f} ms; interleaved reps",
    )
    bench.record(
        "nin_lora_loop_auto_ms", best["auto"] * 1e3, "ms/step",
        f"adaptive_prefetch (trainer.fit) steady state; measured winner: "
        f"depth {choice.get('depth', '?')}; interleaved reps",
    )


def _serve_latency(bench, rng, arch):
    """Serving API request latency + throughput (serve.py::Predictor).

    Two configurations of the same zero-shot N-Caltech predictor (smoke
    weights — latency is weight-independent):
      - batch_size=1: the latency-optimal deployment; p50/p95 of a
        single-stream predict() call, raw events in -> label out
        (host windowing + H2D + rasterize + encode + aggregation + D2H).
      - batch_size=32: request throughput on a 32-stream call.
    The reference has no serving surface (its deployment story is re-running
    test.py over a dataset tree), so these rows have no baseline column.
    """
    from eventclip_tpu.serve import Predictor
    from eventclip_tpu.utils.config import load_params

    cfg_path = os.environ.get("BENCH_SERVE_CONFIG") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "configs/zsclip/zsclip_ncaltech_params.py")
    params = load_params(cfg_path)
    # latency is head-independent; the zero-shot head needs no checkpoint
    params.model = "ZSCLIP"
    params.clip_dict["arch"] = arch
    n_ev = int(os.environ.get("BENCH_SERVE_EVENTS", "40000"))  # 2 windows
    reps = int(os.environ.get("BENCH_SERVE_ITERS", "20"))
    req_bs = int(os.environ.get("BENCH_SERVE_BATCH", "32"))
    from eventclip_tpu.data.datasets import DATASET_CLASSES

    H, W = DATASET_CLASSES[params.dataset].resolution
    names = [f"class_{i}" for i in range(101)]

    def streams(n):
        out = []
        for _ in range(n):
            ev = np.stack([
                rng.integers(0, W, n_ev), rng.integers(0, H, n_ev),
                np.sort(rng.random(n_ev)), rng.choice([-1.0, 1.0], n_ev),
            ], axis=1).astype(np.float32)
            out.append(ev)
        return out

    import contextlib

    # the smoke-mode warnings print to stdout (CLI UX) — bench.py's stdout
    # contract is ONE JSON line, so route them to stderr here
    with contextlib.redirect_stdout(sys.stderr):
        lat = Predictor(params, names, smoke=True, batch_size=1)
    one = streams(1)
    lat.predict(one)  # compile + warm
    times = []
    for _ in range(reps):
        t = time.time()
        lat.predict(one)
        times.append((time.time() - t) * 1e3)
    times.sort()
    # nearest-rank p95: ceil(0.95*n)-1 (int(n*0.95) would index the max
    # sample at n=20, mislabeling the worst-case outlier as p95)
    p95 = times[max(math.ceil(len(times) * 0.95) - 1, 0)]
    # host/device split of one call (one-shot — the phase note, not the
    # percentile basis): windowing is host numpy/native, the rest is
    # H2D + forward + D2H through the relay
    t0 = time.time()
    w1, v1 = lat.gather_windows(one)
    t1 = time.time()
    lat.predict_windows(w1, v1)
    t2 = time.time()
    bench.record("serve_latency_p50_ms", times[len(times) // 2], "ms",
                 f"single stream, batch_size=1, {arch}; p95={p95:,.1f} ms; "
                 f"split: window {1e3 * (t1 - t0):.1f} + device "
                 f"{1e3 * (t2 - t1):.1f} ms (1-shot)")

    with contextlib.redirect_stdout(sys.stderr):
        thr = Predictor(params, names, smoke=True, batch_size=req_bs)
    req = streams(req_bs)
    thr.predict(req)  # compile + warm
    t = time.time()
    for _ in range(max(reps // 4, 1)):
        thr.predict(req)
    dt = (time.time() - t) / max(reps // 4, 1)
    # host/device split of one request (single-threaded windowing) — the
    # fused row's phase note reads against this
    t0 = time.time()
    wins, valids = thr.gather_windows(req)
    t1 = time.time()
    thr.predict_windows(wins, valids)
    t2 = time.time()
    bench.record("serve_throughput_streams_per_sec", len(req) / dt,
                 "streams/s",
                 f"{req_bs}-stream request, batch_size={req_bs}, {arch}; "
                 f"split: window {1e3 * (t1 - t0):.1f} + device "
                 f"{1e3 * (t2 - t1):.1f} ms (1 thread)")

    # microbatched concurrent load: req_bs threads each submit ONE stream;
    # the fuser turns them into fused device batches instead of req_bs
    # serialized forwards (~1/p50 each). Uses the same batch_size=req_bs
    # predictor, so the headroom vs the row above is pure fusion overhead.
    import threading

    from eventclip_tpu.server import MicroBatcher

    # adaptive collect: keeps waiting while arrivals continue (quiet 10 ms
    # closes the batch), hard cap 100 ms — a burst whose host windowing
    # staggers arrivals over ~40 ms still fuses into ONE device batch
    mb = MicroBatcher(thr, max_wait_ms=100.0, idle_gap_ms=10.0)
    try:
        singles = [[s] for s in req]

        def fire_all():
            ts = [threading.Thread(target=mb.submit, args=(s,))
                  for s in singles]
            for th in ts:
                th.start()
            for th in ts:
                th.join()

        fire_all()  # warm (packed-K variants may compile here)
        mb.batch_log.clear()  # attribute the timed cycles only
        t = time.time()
        n_iters = max(reps // 4, 1)
        for _ in range(n_iters):
            fire_all()
        dt = (time.time() - t) / n_iters
        # phase attribution: where a fused cycle's time goes (the fused row
        # historically lagged the same-run batched row ~20% with the
        # residual unexplained; the worker now logs per-batch split)
        log = list(mb.batch_log)
        split = ""
        if log:
            mean = {k: sum(b[k] for b in log) / len(log)
                    for k in ("window_ms", "close_ms", "lock_ms",
                              "device_ms", "slice_ms", "streams")}
            split = (f"; phase split/batch over {len(log)} batches "
                     f"({mean['streams']:.1f} streams each): "
                     f"window {mean['window_ms']:.1f}, "
                     f"close-wait {mean['close_ms']:.1f}, "
                     f"lock {mean['lock_ms']:.1f}, "
                     f"device {mean['device_ms']:.1f}, "
                     f"slice {mean['slice_ms']:.1f}")
            if len(log) == n_iters:
                # one batch per burst: the wall-clock remainder is the
                # bench's own thread spawn/join overhead
                spawn_ms = dt * 1e3 - sum(
                    mean[k] for k in ("window_ms", "close_ms", "lock_ms",
                                      "device_ms", "slice_ms"))
                split += f", spawn+join {spawn_ms:.1f} ms"
            else:
                # bursts split into sequential batches whose phases
                # OVERLAP (batch k+1's close-wait covers batch k's
                # device phase) — a summed residual would be incoherent
                split += (", residual n/a (bursts split; phases overlap "
                          "— the split itself is the finding)")
        bench.record("serve_microbatch_streams_per_sec", len(req) / dt,
                     "streams/s",
                     f"{req_bs} concurrent 1-stream requests fused by "
                     f"MicroBatcher(cap 100 ms, idle gap 10 ms), "
                     f"batch_size={req_bs}, {arch}{split}")
    finally:
        mb.close()


def _device_alive(timeout_s: float = 180.0):
    """Probe the accelerator with a tiny matmul in a SEPARATE process.

    The axon relay can wedge for 15-240+ min (HBM OOM / Mosaic crashes —
    see CLAUDE.md); a wedged chip hangs the first dispatch forever, so a
    bench run would burn the driver's whole budget producing nothing. A
    subprocess probe with a timeout turns that into a fast, explicit
    failure. 180 s default: a cold relay legitimately takes ~30-60 s.
    Returns None when healthy, else a diagnosis string (a timeout is the
    wedge signature; a fast non-zero exit is a DIFFERENT problem whose
    stderr matters — waiting for 'recovery' would be the wrong advice)."""
    import subprocess

    code = ("import jax, jax.numpy as jnp;"
            "x = jnp.ones((256, 256), jnp.bfloat16);"
            "print(float((x @ x).sum()))")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True,
                           timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return (f"tiny-matmul probe timed out after {timeout_s:.0f}s — "
                "relay wedged; re-run after recovery (15-240+ min)")
    if r.returncode == 0:
        return None
    tail = (r.stderr or "").strip().splitlines()[-3:]
    return (f"tiny-matmul probe exited {r.returncode} (NOT a wedge — fix "
            f"the environment): {' | '.join(tail)}")


def _device_alive_with_wait():
    """_device_alive, retried across a bounded recovery window.

    Relay wedges clear on their own (15-240+ min); when bench is the
    round's one shot at real numbers, failing instantly on a wedge that
    clears five minutes later throws the round away. Retry the probe for
    up to BENCH_PROBE_WAIT_S (default 40 min — round-4 wedges after full
    bench runs outlasted the old 20-min budget; 0 = fail fast) — but only
    for the wedge signature; a fast non-zero exit is an environment
    problem no amount of waiting fixes. Returns (diagnosis, n_retries);
    n_retries > 0 means a wedge was observed before the probe passed."""
    deadline = time.monotonic() + float(
        os.environ.get("BENCH_PROBE_WAIT_S", "2400"))
    retries = 0
    while True:
        diagnosis = _device_alive()
        if diagnosis is None or "timed out" not in diagnosis:
            return diagnosis, retries
        if time.monotonic() >= deadline:
            return diagnosis, retries
        retries += 1
        print(f"# probe: {diagnosis}; retrying until the wait budget ends",
              file=sys.stderr, flush=True)
        time.sleep(60)


def _post_wedge_cooldown(retries: int) -> str:
    """After a wedge clears, the chip serves ~15 min of silently DEGRADED
    perf (CLAUDE.md; a round-5 canonical run that started the instant the
    probe passed measured the fused serving row at 37.1 streams/s with a
    609 ms device phase — 2x the same run's healthy batched row). When
    the probe had to retry, sleep BENCH_RECOVERY_COOLDOWN_S (default
    10 min; 0 = off) before the stages, and return a note recording the
    run's conditions for the artifact either way."""
    cooldown = float(os.environ.get("BENCH_RECOVERY_COOLDOWN_S", "600"))
    if not retries:
        return ""
    if cooldown > 0:
        print(f"# probe passed after {retries} wedge retries; cooling "
              f"down {cooldown:.0f}s before stages (degraded-perf "
              f"window)", file=sys.stderr, flush=True)
        time.sleep(cooldown)
        return (f"started after a relay wedge ({retries} probe retries) "
                f"+ {cooldown:.0f}s cooldown")
    return (f"started IMMEDIATELY after a relay wedge ({retries} probe "
            f"retries, no cooldown) — serving rows may sit in the "
            f"degraded window")


if __name__ == "__main__":
    if os.environ.get("BENCH_SKIP_PROBE", "") == "1":
        diagnosis, retries = None, 0
    else:
        diagnosis, retries = _device_alive_with_wait()
    if diagnosis is not None:
        print(json.dumps({
            "metric": "event2img_events_per_sec", "value": 0.0,
            "unit": "events/s", "vs_baseline": 0.0,
            "error": f"accelerator unreachable: {diagnosis}",
        }))
        sys.exit(0)
    main(run_conditions=_post_wedge_cooldown(retries))
