#!/usr/bin/env python
"""Regenerate the machine-owned result numbers in BASELINE.md + README.md.

Rounds 2-4 each shipped BASELINE.md serving/overlap result envelopes that
lagged the canonical artifact, because those numbers were re-typed by hand
every time the driver re-ran bench.py. This script makes them mechanical:

- every result number BASELINE.md quotes from the canonical full bench run
  lives inside a ``<!--gen:NAME-->...<!--/gen-->`` span,
- this script recomputes each span from ``BENCH_STAGES.json`` (latest
  canonical full run) plus ``BENCH_HISTORY.jsonl`` (one record per
  canonical full run, appended by bench.py) and rewrites the file,
- ``tests/test_baseline_prose.py::test_generated_spans_current`` asserts
  the spans in the committed file equal what this script would write, so a
  canonical re-run that moves a result fails CI with the exact command to
  fix it (``python scripts/update_baseline.py``) instead of shipping stale
  prose.

Hand-written history sentences ("round 4 measured X") are immutable facts
and stay outside the spans; only "current result" claims are generated.
"""

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STAGES_PATH = os.path.join(REPO, "BENCH_STAGES.json")
HISTORY_PATH = os.path.join(REPO, "BENCH_HISTORY.jsonl")
BASELINE_PATH = os.path.join(REPO, "BASELINE.md")
README_PATH = os.path.join(REPO, "README.md")
# every file whose result numbers this script owns; a span may appear in
# more than one of them (same name -> same regenerated text everywhere)
GENERATED_FILES = (BASELINE_PATH, README_PATH)

SPAN_RE = re.compile(r"<!--gen:([\w-]+)-->(.*?)<!--/gen-->", re.S)


def load_stages(path=STAGES_PATH):
    """BENCH_STAGES.json -> {metric: value}, plus {metric + '.note': str}."""
    out = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            out[rec["metric"]] = rec["value"]
            out[rec["metric"] + ".note"] = rec.get("note", "")
    return out


def load_history(path=HISTORY_PATH):
    """BENCH_HISTORY.jsonl -> (runs, n_degraded): the {metric: value}
    stage dicts of healthy canonical runs (oldest first), plus the count
    of records carrying a ``degraded_window`` annotation. Degraded-window
    records (a run whose serving stages executed inside the chip's
    ~15 min post-wedge degraded-perf window — an environment condition,
    not a code result) are excluded from the result envelopes and
    surfaced as an explicit exclusion count instead."""
    if not os.path.exists(path):
        return [], 0
    runs, degraded = [], 0
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            if rec.get("degraded_window"):
                degraded += 1
            else:
                runs.append(rec["stages"])
    return runs, degraded


def _vals(cur, hist, metric):
    vals = [h[metric] for h in hist if metric in h]
    if metric in cur:
        vals.append(cur[metric])
    if not vals:
        raise KeyError(f"metric {metric!r} in neither BENCH_STAGES.json "
                       f"nor BENCH_HISTORY.jsonl")
    return vals


def _num(v, nd=1):
    return f"{v:.{nd}f}"


def _envelope(cur, hist, metric, nd=1, scale=1.0):
    """min-max across all recorded canonical runs, or the single value."""
    vals = sorted(v * scale for v in _vals(cur, hist, metric))
    lo, hi = _num(vals[0], nd), _num(vals[-1], nd)
    return lo if lo == hi else f"{lo}-{hi}"


def _p95(cur):
    m = re.search(r"p95=([\d.]+)", cur["serve_latency_p50_ms.note"])
    if not m:
        raise ValueError("serve_latency_p50_ms note no longer records p95")
    return float(m.group(1))


def _auto_depth(cur):
    m = re.search(r"winner: depth (\d+)", cur["nin_lora_loop_auto_ms.note"])
    return m.group(1) if m else "?"


def _fused_split(cur):
    """The MicroBatcher's per-batch phase attribution (server.py logs it,
    bench.py folds the means into the fused row's note)."""
    m = re.search(r"phase split/batch over .+",
                  cur["serve_microbatch_streams_per_sec.note"])
    return (m.group(0) if m
            else "phase split not recorded by the latest canonical run "
                 "(pre-instrumentation artifact)")


def _batched_split(cur):
    m = re.search(r"split: (window .+? \(1 thread\))",
                  cur["serve_throughput_streams_per_sec.note"])
    return (m.group(1) if m
            else "window/device split not recorded by the latest "
                 "canonical run")


def _ratio_envelope(cur, hist, num, den, nd=2):
    """min-max of a per-run metric ratio across all recorded canonical
    runs (ratios are taken within a run, never across runs)."""
    runs = [h for h in hist if num in h and den in h]
    if num in cur and den in cur:
        runs.append(cur)
    if not runs:
        raise KeyError(f"no run records both {num!r} and {den!r}")
    vals = sorted(r[num] / r[den] for r in runs)
    lo, hi = _num(vals[0], nd), _num(vals[-1], nd)
    return (lo if lo == hi else f"{lo}-{hi}") + "x"


def _encode_pct_ceiling(cur):
    """The encode stage's fraction of the same-run measured matmul ceiling
    (bench.py records both in the encode row's note)."""
    m = re.search(r"(\d+) TFLOP/s vs (\d+) ceiling",
                  cur["encode_ViT-L14_img_per_sec.note"])
    if not m:
        raise ValueError("encode note no longer records TFLOP/s vs ceiling")
    return f"{100.0 * float(m.group(1)) / float(m.group(2)):.0f}%"


def compute_spans(cur, hist, n_degraded=0):
    """Span name -> regenerated text. Every name here must appear in at
    least one GENERATED_FILES member (the test asserts coverage both ways);
    the same name may appear in several files and gets the same text."""
    p50 = cur["serve_latency_p50_ms"]
    batched = cur["serve_throughput_streams_per_sec"]
    fused = cur["serve_microbatch_streams_per_sec"]
    floor = 1000.0 / p50
    n_runs = len(hist) if hist else 1
    excluded = (f"; {n_degraded} degraded-window run(s) excluded "
                f"from envelopes (annotated in the history file)"
                if n_degraded else "")
    spans = {
        # headline event2img + rasterize rows
        "event2img_latest": _num(cur["event2img_events_per_sec"] / 1e6)
        + "M",
        "event2img_env": _envelope(cur, hist, "event2img_events_per_sec",
                                   scale=1e-6) + "M",
        "rasterize_env": _envelope(cur, hist, "rasterize_events_per_sec",
                                   scale=1e-6) + "M",
        # serving row (canonical latest run)
        "serve_p50": _num(p50),
        "serve_p95": _num(_p95(cur)),
        "serve_batched": _num(batched),
        "serve_fused": _num(fused),
        "serve_floor": _num(floor),
        "serve_fused_ratio": _num(fused / floor) + "x",
        "serve_fused_pct": f"{100.0 * fused / batched:.0f}%",
        "serve_fused_split": _fused_split(cur),
        "serve_batched_split": _batched_split(cur),
        "serve_env": (
            f"across the {n_runs} recorded canonical full run(s) "
            f"(`BENCH_HISTORY.jsonl`): "
            f"p50 {_envelope(cur, hist, 'serve_latency_p50_ms')} ms, "
            f"batched "
            f"{_envelope(cur, hist, 'serve_throughput_streams_per_sec')}, "
            f"fused "
            f"{_envelope(cur, hist, 'serve_microbatch_streams_per_sec')} "
            f"streams/s{excluded}"
        ),
        # input-feed / compute overlap table (canonical latest run)
        "ov_feed": _num(cur["nin_lora_feed_ms"]),
        "ov_step": _num(cur["nin_lora_step_ms"]),
        "ov_serial": _num(cur["nin_lora_loop_serialized_ms"]),
        "ov_prefetch": _num(cur["nin_lora_loop_prefetch_ms"]),
        "ov_auto": _num(cur["nin_lora_loop_auto_ms"]),
        "ov_auto_depth": _auto_depth(cur),
        "ov_sum": _num(cur["nin_lora_feed_ms"] + cur["nin_lora_step_ms"]),
        # README headline bullets (canonical latest run)
        "enc_l14": _num(cur["encode_ViT-L14_img_per_sec"], 0),
        "enc_l14_pct": _encode_pct_ceiling(cur),
        "enc_l14_int8": _num(cur["encode_int8_ViT-L14_img_per_sec"], 0),
        "enc_l14_int8_calib": _num(
            cur["encode_int8_static_ViT-L14_img_per_sec"], 0),
        "prune_ratio_e2e": _num(
            cur["e2e_int8_prune_events_per_sec"]
            / cur["e2e_events_per_sec"]) + "x",
        # throughput-table rows backed by canonical metrics (envelopes
        # across all recorded canonical runs; hand-written history ranges
        # from before BENCH_HISTORY existed stay outside the spans)
        "enc_l14_env": _envelope(cur, hist, "encode_ViT-L14_img_per_sec",
                                 0),
        "enc_i8_env": _envelope(cur, hist,
                                "encode_int8_ViT-L14_img_per_sec", 0),
        "enc_i8c_env": _envelope(
            cur, hist, "encode_int8_static_ViT-L14_img_per_sec", 0),
        "e2e_env": _envelope(cur, hist, "e2e_events_per_sec",
                             scale=1e-6) + "M",
        "e2e_i8_env": _envelope(cur, hist, "e2e_int8_events_per_sec",
                                scale=1e-6) + "M",
        "e2e_prune_env": _envelope(cur, hist,
                                   "e2e_int8_prune_events_per_sec",
                                   scale=1e-6) + "M",
        "fs_step_env": _envelope(cur, hist, "fsclip_train_step_ms"),
        "fs_aug_env": _envelope(cur, hist, "fsclip_aug_train_step_ms"),
        "fs_b32_env": _envelope(cur, hist, "fsclip_train_step_b32_ms"),
        "lora_env": _envelope(cur, hist, "ftclip_lora_train_step_ms"),
        "ftfull_env": _envelope(cur, hist, "ftclip_full_train_step_ms"),
        "eval_padded_env": _envelope(
            cur, hist, "eval_ragged_padded_samples_per_sec", 0),
        "eval_packed_env": _envelope(
            cur, hist, "eval_ragged_packed_samples_per_sec", 0),
        "pack_ratio_env": _ratio_envelope(
            cur, hist, "eval_ragged_packed_samples_per_sec",
            "eval_ragged_padded_samples_per_sec"),
        "host_env": _envelope(cur, hist, "host_pipeline_events_per_sec",
                              scale=1e-6) + "M",
        "vs_ratio_env": _ratio_envelope(
            cur, hist, "event2img_events_per_sec",
            "host_pipeline_events_per_sec", nd=0),
    }
    return spans


def regenerate(text, spans, fname="BASELINE.md"):
    """Replace every gen span's body; error on unknown names. Returns the
    rewritten text plus the set of span names the file used (a file may
    carry any subset — main() checks coverage across all GENERATED_FILES)."""
    seen = set()

    def _sub(m):
        name = m.group(1)
        if name not in spans:
            raise KeyError(f"{fname} has <!--gen:{name}--> but "
                           f"update_baseline.py defines no such span")
        seen.add(name)
        return f"<!--gen:{name}-->{spans[name]}<!--/gen-->"

    return SPAN_RE.sub(_sub, text), seen


def main():
    hist, n_degraded = load_history()
    spans = compute_spans(load_stages(), hist, n_degraded)
    seen_all = set()
    for path in GENERATED_FILES:
        fname = os.path.basename(path)
        with open(path) as f:
            text = f.read()
        new, seen = regenerate(text, spans, fname)
        seen_all |= seen
        if new == text:
            print(f"{fname} already current")
            continue
        with open(path, "w") as f:
            f.write(new)
        old_spans = dict(SPAN_RE.findall(text))
        new_spans = dict(SPAN_RE.findall(new))
        changed = sorted(
            n for n in new_spans if old_spans.get(n) != new_spans[n])
        print(f"{fname} regenerated ({len(changed)} span(s) changed: "
              f"{', '.join(changed)})")
    missing = set(spans) - seen_all
    if missing:
        raise KeyError(
            f"no generated file carries gen spans: {sorted(missing)} — "
            f"restore the <!--gen:NAME--> markers")
    return 0


if __name__ == "__main__":
    sys.exit(main())
