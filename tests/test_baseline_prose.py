"""BASELINE.md stage parameters must match bench.py's actual constants.

Rounds 1-3 each shipped at least one sentence in BASELINE.md describing
bench parameters bench.py no longer used (a "5 ms window" after the stage
moved to a 100 ms adaptive cap; a latency envelope from an older geometry).
This pins the quoted numbers to the source mechanically: change a stage
constant in bench.py and this test points at the BASELINE sentence that
now lies.

Prose numbers (the measured results themselves) are NOT pinned — only the
*parameters* of the measurement: window/cap/gap, batch sizes, rep counts,
stage geometry.
"""

import os
import re

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
