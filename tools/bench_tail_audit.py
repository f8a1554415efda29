"""Audit the catalog entries NOT in bench.py's HEADLINE set (round-11,
r10 verdict #6: the headline number can't be allowed to hide a
regression in an unbenched family).

Times every non-headline entry once (or --runs N, min) at sf0.1 through
the noop sink and prints the sorted tail, flagging anything slower than
--threshold (default 2.0 s — comfortably under the slowest headline
entries at ~3 s, so the flag fires before a family could hide behind
them).  bench.py's contract after this audit: HEADLINE contains every
entry whose sf0.1 wall time exceeds the threshold, plus one
representative per operator family.

Usage: python tools/bench_tail_audit.py [--threshold 2.0] [--runs 1]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from tts_data_pipeline_spark.plans import catalog  # noqa: E402
from tts_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    threshold = 2.0
    runs = 1
    args = sys.argv[1:]
    while args:
        if args[0] == "--threshold":
            threshold = float(args[1])
        elif args[0] == "--runs":
            runs = int(args[1])
        args = args[2:]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    queries = catalog.queries()
    tail = [n for n in queries if n not in HEADLINE]
    spark = get_spark(
        "bench_tail_audit", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    queries["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    times: dict[str, float] = {}
    for name in sorted(tail):
        best = math.inf
        for _ in range(runs):
            t0 = time.time()
            try:
                queries[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as ex:  # noqa: BLE001 — audit must finish
                print(f"ERROR {name}: {ex}", flush=True)
                best = float("nan")
                break
            best = min(best, time.time() - t0)
        times[name] = round(best, 2)
        print(json.dumps({"query": name, "sec": times[name]}), flush=True)

    flagged = {n: t for n, t in times.items() if t > threshold}
    print(
        json.dumps(
            {
                "audited": len(times),
                "threshold": threshold,
                "flagged": dict(
                    sorted(flagged.items(), key=lambda kv: -kv[1])
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
