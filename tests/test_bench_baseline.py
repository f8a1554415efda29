"""Per-entry bench baseline gate (r11 verdict #2).

BENCH_BASELINE.json pins an idle-host per-entry reference; bench.py
emits per-run ratios against it so a UNIFORM shift reads as host
baseline (median moves, outliers empty) and a genuine per-entry code
regression reads as an outlier against a flat median.
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_baseline_file_covers_headline():
    bench = _load_bench()
    with open(os.path.join(REPO, "BENCH_BASELINE.json")) as f:
        base = json.load(f)
    assert base["sf"] == 0.1
    missing = [q for q in bench.HEADLINE if q not in base["queries"]]
    # entries added after the baseline was recorded are allowed to be
    # absent (they get ratios on the next --record-baseline), but the
    # bulk of the headline set must be pinned
    assert len(missing) <= max(5, len(bench.HEADLINE) // 10), missing
    # provenance: recorded on an idle host (PLANS.md reference point)
    assert base["host_load"]["loadavg_before"][0] < 1.5


def test_ratio_summary_separates_uniform_shift_from_outlier():
    bench = _load_bench()
    with open(os.path.join(REPO, "BENCH_BASELINE.json")) as f:
        base = json.load(f)
    names = list(base["queries"])[:40]

    # uniform 1.3x host shift: median moves, NO outliers
    uniform = {n: round(base["queries"][n] * 1.3, 3) for n in names}
    s = bench._baseline_ratios(uniform, 0.1)
    assert 1.25 <= s["ratio_median"] <= 1.35
    assert s["outliers"] == {}

    # one entry regresses 4x while the rest hold: exactly that outlier
    regressed = {n: base["queries"][n] for n in names}
    victim = max(names, key=lambda n: base["queries"][n])
    regressed[victim] = round(base["queries"][victim] * 4, 3)
    s = bench._baseline_ratios(regressed, 0.1)
    assert list(s["outliers"]) == [victim]
    assert s["ratio_median"] <= 1.05

    # sf mismatch never compares apples to oranges
    s = bench._baseline_ratios(uniform, 0.01)
    assert "note" in s
