"""Driver-sample rotation (r11 verdict #1).

The driver certifies the first ~50 entries of catalog order per round.
These tests pin that the rotation in ``plans/catalog.py`` round-robins
committed driver evidence over the WHOLE catalog instead of
re-certifying a static prefix.
"""

from __future__ import annotations

import json
import math
import os

from tts_data_pipeline_spark.plans import catalog

WINDOW = 40  # lower bound on the driver's ~50-entry sample


def _names() -> list[str]:
    return list(catalog.queries())


def test_rotation_covers_catalog_within_ceil_rounds():
    """From an empty history, sampling the first WINDOW entries per round
    covers every catalog entry within ceil(N / WINDOW) rounds."""
    names = _names()
    budget = math.ceil(len(names) / WINDOW)
    history = {"known": list(names), "last_sampled": {}}
    covered: set[str] = set()
    for rnd in range(1, budget + 1):
        order = catalog.rotation_order(names, history)
        window = order[:WINDOW]
        covered.update(window)
        for n in window:
            history["last_sampled"][n] = rnd
    assert covered == set(names), sorted(set(names) - covered)


def test_rotation_resamples_stalest_after_full_coverage():
    """Once everything has evidence, the window refreshes the OLDEST
    evidence first (round-robin, not a new static prefix)."""
    names = _names()
    history = {
        "known": list(names),
        "last_sampled": {n: (i % 5) + 1 for i, n in enumerate(names)},
    }
    order = catalog.rotation_order(names, history)
    rounds_in_order = [history["last_sampled"][n] for n in order]
    assert rounds_in_order == sorted(rounds_in_order)


def test_new_entries_lead_the_window():
    """An entry unknown to the committed history (added this round) sorts
    ahead of everything, including never-sampled known entries."""
    names = _names()
    history = {
        "known": list(names[:-1]),  # pretend the last entry is brand new
        "last_sampled": {},
    }
    order = catalog.rotation_order(names, history)
    assert order[0] == names[-1]


def test_committed_history_is_fresh_and_window_is_unsampled():
    """The committed sample_history.json covers the live catalog (guards
    forgetting tools/update_sample_history.py after adding entries), and
    the current first-50 window holds only entries with no committed
    driver evidence yet — until none remain."""
    path = os.path.join(
        os.path.dirname(catalog.__file__), "sample_history.json"
    )
    with open(path) as f:
        history = json.load(f)
    names = _names()
    assert set(history["known"]) >= set(names), (
        "sample_history.json is stale — run tools/update_sample_history.py"
    )
    never = [n for n in names if n not in history["last_sampled"]]
    window = names[:50]
    expect_unsampled = min(len(never), 50)
    assert all(n in never for n in window[:expect_unsampled])
