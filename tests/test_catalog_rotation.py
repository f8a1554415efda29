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
    """The committed sample_history.json is regenerated at ROUND OPEN
    (tools/update_sample_history.py), then left alone: entries added
    mid-round are 'unknown' to it and must lead the catalog, followed
    by known-but-never-sampled entries — so the driver's first-50
    window certifies new work first and stale evidence never crowds
    out unsampled entries."""
    path = os.path.join(
        os.path.dirname(catalog.__file__), "sample_history.json"
    )
    with open(path) as f:
        history = json.load(f)
    names = _names()
    known = set(history["known"])
    # history must not reference entries the catalog no longer has
    # beyond renames (a wholly disjoint file means it was generated
    # against a different catalog)
    assert len(known & set(names)) > len(names) * 0.9, (
        "sample_history.json does not match this catalog — run "
        "tools/update_sample_history.py"
    )
    new_this_round = [n for n in names if n not in known]
    # new entries lead the order, in a block, before everything else
    assert names[: len(new_this_round)] == new_this_round
    never = [
        n
        for n in names
        if n not in history["last_sampled"] and n in known
    ]
    window = names[len(new_this_round):50]
    expect_unsampled = min(len(never), len(window))
    assert all(n in never for n in window[:expect_unsampled])


def test_committed_history_covers_every_driver_artifact():
    """Staleness gate (r12 verdict #1): a forgotten round-open
    ``tools/update_sample_history.py`` run must FAIL the build, not
    silently re-certify stale entries.

    The committed history must (a) list every committed
    ``CORRECTNESS_r*.json`` round in ``generated_from_rounds`` and
    (b) record at least the round each artifact entry appeared in —
    if a new driver artifact lands and the history isn't regenerated,
    both checks break loudly with the regeneration command.
    """
    import glob

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(
        os.path.dirname(catalog.__file__), "sample_history.json"
    )
    with open(path) as f:
        history = json.load(f)
    seen_rounds = set(history.get("generated_from_rounds", []))
    last = history.get("last_sampled", {})
    msg = (
        "sample_history.json is stale — run "
        "`python tools/update_sample_history.py` and commit the JSON"
    )
    for artifact_path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(artifact_path).split("_r")[1].split(".")[0])
        assert rnd in seen_rounds, f"{msg} (missing round {rnd})"
        with open(artifact_path) as f:
            artifact = json.load(f)
        for name in artifact:
            assert name in last and last[name] >= rnd, (
                f"{msg} ({name} certified in r{rnd} but history says "
                f"{last.get(name)})"
            )
