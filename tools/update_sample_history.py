"""Regenerate the driver-sample rotation state (r11 verdict #1).

The driver certifies the FIRST 50 entries of catalog order in each
round's ``CORRECTNESS_r{N}.json``.  Before round 12 that prefix was a
static ``_PRIORITY`` list, so the same ~50 entries were re-certified
every round while 131 of 255 never appeared in any committed driver
artifact.  This tool scans every committed ``CORRECTNESS_r*.json`` plus
the live catalog and writes
``tts_data_pipeline_spark/plans/sample_history.json``::

    {
      "generated_from_rounds": [1, ..., 11],
      "known": [<every catalog name at generation time>],
      "last_sampled": {<name>: <latest round it appeared in>}
    }

``plans/catalog.py`` orders the catalog from this file:
new-this-round entries (not in ``known``) first, then known entries
that have never been sampled, then everything else by staleness
(oldest ``last_sampled`` first).  Run this at each round open, commit
the refreshed JSON, and the driver's 50-entry window round-robins the
full catalog within ceil(N/window) rounds (pinned by
``tests/test_catalog_rotation.py``).

Usage: python tools/update_sample_history.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(
    REPO, "tts_data_pipeline_spark", "plans", "sample_history.json"
)


def main() -> None:
    from tts_data_pipeline_spark.plans import catalog

    last_sampled: dict[str, int] = {}
    rounds: list[int] = []
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
        rounds.append(rnd)
        with open(path) as f:
            artifact = json.load(f)
        for name in artifact:
            last_sampled[name] = max(last_sampled.get(name, 0), rnd)

    known = sorted(catalog.queries().keys())
    history = {
        "generated_from_rounds": rounds,
        "known": known,
        "last_sampled": dict(sorted(last_sampled.items())),
    }
    with open(OUT, "w") as f:
        json.dump(history, f, indent=1, sort_keys=True)
        f.write("\n")
    never = [n for n in known if n not in last_sampled]
    print(
        f"wrote {OUT}: {len(known)} known, "
        f"{len(last_sampled)} ever sampled, {len(never)} never sampled"
    )


if __name__ == "__main__":
    main()
