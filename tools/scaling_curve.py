"""Measure scaling exponents for the most expensive catalog queries.

Runs each query at sf0.1 (driver data) and sf0.3 / sf1 (tiled via
``tools/gen_scale_data.py``), materializing through the ``noop`` sink
(min of ``--runs`` passes guards host noise), then fits the log-log slope
of wall time vs scale factor.  Slope ~1 = linear scaling; <1 = fixed
per-job overhead still dominates at these sizes; >1 = superlinear — a
plan that will not survive 100 TB and needs a named cause.

Wall times INCLUDE per-query fixed costs (job scheduling, codegen,
driver-side model-state rounds), so small-t queries read as sublinear;
the slope is a lower bound on asymptotic behavior and the interesting
signal is any slope meaningfully ABOVE 1.

Usage: python tools/scaling_curve.py [--runs 2] [query ...]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tts_data_pipeline_spark.plans import catalog  # noqa: E402
from tts_data_pipeline_spark.session import get_spark  # noqa: E402

DEFAULT_QUERIES = [
    "dedup_clusters",
    "ta_bpe_learn_merges",
    "ta_perplexity_bigram",
    "dedup_semantic_clusters",
    "w11_gap_fill_ffill",
    "q21_multi_supplier_pending",
    "emb_kmeans_lloyd",
    "ta_trigram_lang_id",
    "graph_pagerank_trade",
    "ta_bigram_pmi",
    "dedup_minhash_lsh",
    "ta_decontaminate_eval",
    "sim_ivf_topk",
    "dedup_paragraph_exact",
    "q1_pricing_summary",
]

SCALES = [
    (0.1, "/root/testdata/sf0.1"),
    (0.3, "/tmp/scaledata/sf0.3"),
    (1.0, "/tmp/scaledata/sf1"),
]


def main() -> None:
    runs = 2
    args = sys.argv[1:]
    if args and args[0] == "--runs":
        runs = int(args[1])
        args = args[2:]
    names = args or DEFAULT_QUERIES
    queries = catalog.queries()
    spark = get_spark(
        "scaling_curve", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    # warm the session once so the first measured query doesn't pay JVM
    # startup
    queries["q1_pricing_summary"](spark, SCALES[0][1]).write.format(
        "noop"
    ).mode("overwrite").save()

    results = {}
    for name in names:
        fn = queries[name]
        times = {}
        for sf, d in SCALES:
            best = math.inf
            for _ in range(runs):
                t0 = time.time()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            times[sf] = round(best, 3)
        xs = [math.log(sf) for sf, _ in SCALES]
        ys = [math.log(max(times[sf], 1e-3)) for sf, _ in SCALES]
        mx = sum(xs) / len(xs)
        my = sum(ys) / len(ys)
        slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
            (x - mx) ** 2 for x in xs
        )
        results[name] = {"times": times, "slope": round(slope, 2)}
        print(
            json.dumps({"query": name, **results[name]}),
            flush=True,
        )
    print("\n| query | sf0.1 s | sf0.3 s | sf1 s | slope |")
    print("|---|---|---|---|---|")
    for name, r in sorted(results.items(), key=lambda kv: -kv[1]["slope"]):
        t = r["times"]
        print(
            f"| `{name}` | {t[0.1]} | {t[0.3]} | {t[1.0]} | {r['slope']} |"
        )


if __name__ == "__main__":
    main()
