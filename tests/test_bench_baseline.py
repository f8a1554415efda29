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


def test_retime_absorbs_settling_noise_but_keeps_regressions():
    """r12 verdict #2: a bench started right after a heavy sweep flags
    early entries at ~1.8x (settling-host noise outlasting min-of-3);
    the end-of-session re-time must clear those WITHOUT clearing a
    genuine code regression."""
    bench = _load_bench()
    with open(os.path.join(REPO, "BENCH_BASELINE.json")) as f:
        base = json.load(f)
    names = sorted(base["queries"], key=lambda n: -base["queries"][n])[:40]
    noisy, regressed = names[0], names[1]

    timings = {n: base["queries"][n] for n in names}
    timings[noisy] = round(base["queries"][noisy] * 1.8, 3)
    timings[regressed] = round(base["queries"][regressed] * 4.0, 3)
    all_passes = {n: [timings[n]] * 3 for n in names}

    def run_once(name):
        # by re-time the host has settled: the noisy entry reads ~1x
        # again, the regression is still 4x (it is the code)
        if name == regressed:
            return round(base["queries"][name] * 4.0, 3)
        return base["queries"][name]

    retimed, suspects = bench._retime(timings, all_passes, 0.1, run_once)
    assert set(retimed) == {noisy, regressed}
    assert len(all_passes[noisy]) == 5  # two extra passes recorded

    s = bench._baseline_ratios(timings, 0.1)
    assert noisy not in s["outliers"], s["outliers"]
    assert list(s["outliers"]) == [regressed]
    assert s["ratio_median"] <= 1.05
    # the retime passes themselves are gated (r13 advice): the steady
    # regression is suspect on both passes, the settled noise on neither
    assert regressed in suspects and noisy not in suspects


def test_retime_flags_bimodal_regression_even_when_min_clears():
    """r13 advice: a BIMODAL regression (occasionally runs at baseline
    speed) can drop its overall min to ~1x and clear the primary outlier
    flag — exactly like settling noise.  The retime passes are gated
    individually so the slow pass is still surfaced as retime_suspect."""
    bench = _load_bench()
    with open(os.path.join(REPO, "BENCH_BASELINE.json")) as f:
        base = json.load(f)
    names = sorted(base["queries"], key=lambda n: -base["queries"][n])[:40]
    bimodal = names[0]

    timings = {n: base["queries"][n] for n in names}
    timings[bimodal] = round(base["queries"][bimodal] * 4.0, 3)
    all_passes = {n: [timings[n]] * 3 for n in names}

    calls = {"n": 0}

    def run_once(name):
        # first retime pass slow (the regression), second hits the fast
        # mode — the min clears the primary flag
        calls["n"] += 1
        factor = 4.0 if calls["n"] == 1 else 1.0
        return round(base["queries"][name] * factor, 3)

    retimed, suspects = bench._retime(timings, all_passes, 0.1, run_once)
    assert retimed == [bimodal]
    s = bench._baseline_ratios(timings, 0.1)
    assert bimodal not in (s["outliers"] or {})  # min absorbed it...
    assert bimodal in suspects  # ...but the per-pass gate still flags it
    assert len(suspects[bimodal]) == 1  # exactly the one slow pass
