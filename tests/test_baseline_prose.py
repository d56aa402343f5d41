"""BASELINE.md stage parameters must match bench.py's actual constants.

Rounds 1-3 each shipped at least one sentence in BASELINE.md describing
bench parameters bench.py no longer used (a "5 ms window" after the stage
moved to a 100 ms adaptive cap; a latency envelope from an older geometry).
This pins the quoted numbers to the source mechanically: change a stage
constant in bench.py and this test points at the BASELINE sentence that
now lies.

Round 5 closes the other half: the measured RESULTS BASELINE.md quotes from
the canonical bench run live in ``<!--gen:NAME-->`` spans owned by
``scripts/update_baseline.py``, and ``test_generated_spans_current`` below
asserts the committed spans equal what the generator would write from
``BENCH_STAGES.json``/``BENCH_HISTORY.jsonl`` — a driver re-run that moves
a result fails CI with the one command that fixes it, instead of shipping
stale prose (this happened three rounds in a row when the envelopes were
hand-kept).

Hand-written prose numbers outside gen spans are historical facts ("round 4
measured X") and stay unpinned.
"""

import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _read(name):
    with open(os.path.join(REPO, name)) as f:
        return f.read()


def test_microbatch_params_match():
    bench_src = _read("bench.py")
    baseline = _read("BASELINE.md")

    m = re.search(
        r"MicroBatcher\(thr,\s*max_wait_ms=([\d.]+),\s*idle_gap_ms=([\d.]+)\)",
        bench_src,
    )
    assert m, "bench.py serving stage no longer builds a MicroBatcher?"
    cap, gap = float(m.group(1)), float(m.group(2))

    # the serving row must quote exactly these two knobs
    row = next(line for line in baseline.splitlines()
               if line.startswith("| serving API request"))
    pm = re.search(r"cap (\d+) ms, idle gap (\d+) ms", row)
    assert pm, "BASELINE serving row no longer quotes the MicroBatcher knobs"
    assert float(pm.group(1)) == cap and float(pm.group(2)) == gap, (
        f"BASELINE quotes cap {pm.group(1)}/gap {pm.group(2)} ms but "
        f"bench.py runs cap {cap}/gap {gap} ms"
    )
    # the round-3 stale phrasing must not come back
    assert "5 ms window" not in baseline


def test_serve_stage_defaults_match():
    bench_src = _read("bench.py")
    baseline = _read("BASELINE.md")
    row = next(line for line in baseline.splitlines()
               if line.startswith("| serving API request"))

    reps = int(re.search(
        r'BENCH_SERVE_ITERS", "(\d+)"', bench_src).group(1))
    req_bs = int(re.search(
        r'BENCH_SERVE_BATCH", "(\d+)"', bench_src).group(1))
    assert f"{reps} reps" in row, (
        f"BASELINE serving row must quote the {reps}-rep percentile basis")
    assert f"{req_bs}-stream request" in row
    assert f"{req_bs} fully concurrent 1-stream requests" in row


def test_feed_overlap_geometry_matches():
    bench_src = _read("bench.py")
    baseline = _read("BASELINE.md")

    def default(name):
        return int(re.search(
            rf'BENCH_OVERLAP_{name}", "(\d+)"', bench_src).group(1))

    H, W, N, B = (default(k) for k in ("H", "W", "N", "BATCH"))
    # the overlap section header quotes the stage geometry
    sec = baseline.split("## Input-feed / compute overlap")[1]
    head = sec.split("|", 1)[0]
    geom = f"B={B}, T=2, N={N // 1000}k"
    assert geom in head, (
        f"BASELINE overlap section should quote '{geom}' "
        f"(bench.py geometry {H}x{W} B={B} N={N})"
    )


def test_generated_spans_current():
    """Every <!--gen:NAME--> span in the generated files (BASELINE.md,
    README.md) must hold exactly the text scripts/update_baseline.py would
    regenerate from the current bench artifacts; each file may carry any
    subset of spans but together they must cover all of them."""
    import sys

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        import update_baseline as ub
    finally:
        sys.path.pop(0)

    if not os.path.exists(ub.STAGES_PATH):
        pytest.skip("no canonical BENCH_STAGES.json on this host")
    hist, n_degraded = ub.load_history()
    spans = ub.compute_spans(ub.load_stages(), hist, n_degraded)

    seen_all = set()
    for path in ub.GENERATED_FILES:
        fname = os.path.basename(path)
        found = dict(ub.SPAN_RE.findall(_read(fname)))
        seen_all |= set(found)
        unknown = set(found) - set(spans)
        assert not unknown, (
            f"{fname} has gen spans update_baseline.py does not define: "
            f"{sorted(unknown)}")
        stale = {n: (found[n], spans[n])
                 for n in found if found[n] != spans[n]}
        assert not stale, (
            f"{fname} gen spans are stale vs BENCH_STAGES.json/"
            "BENCH_HISTORY.jsonl — run `python scripts/update_baseline.py` "
            f"(stale: { {n: f'{a!r} -> {b!r}' for n, (a, b) in stale.items()} })")
    missing = set(spans) - seen_all
    assert not missing, (
        f"no generated file carries gen spans: {sorted(missing)} — restore "
        f"the <!--gen:NAME-->...<!--/gen--> markers")


def test_bench_history_appended_only_on_canonical_runs(tmp_path, monkeypatch):
    """bench.py must append one history record per CANONICAL full run (the
    feed for update_baseline's envelopes) and never for suffixed runs."""
    import json
    import sys

    sys.path.insert(0, REPO)
    try:
        import bench
    finally:
        sys.path.pop(0)

    stages = tmp_path / "BENCH_STAGES.json"
    history = tmp_path / "BENCH_HISTORY.jsonl"
    monkeypatch.setattr(bench, "STAGES_PATH", str(stages))
    monkeypatch.setattr(bench, "HISTORY_PATH", str(history))
    records = [
        {"metric": "event2img_events_per_sec", "value": 1.0, "unit": "e/s",
         "note": ""},
        {"metric": "serve_latency_p50_ms", "value": 50.0, "unit": "ms",
         "note": "p95=60.0 ms"},
    ]

    # suffixed (non-canonical) run: stage file only, no history
    other = tmp_path / "BENCH_STAGES-quick.json"
    bench.write_stage_artifacts(records, str(other))
    assert other.exists() and not history.exists()

    # canonical run: stage file + one appended history record per run
    bench.write_stage_artifacts(records, str(stages))
    bench.write_stage_artifacts(records, str(stages))
    lines = [json.loads(l) for l in history.read_text().splitlines()]
    assert len(lines) == 2
    assert lines[0]["stages"] == {r["metric"]: r["value"] for r in records}
    assert lines[0]["ts"] > 0
