"""Isolate and time individual catalog entries with the noop sink
(guide §1.4): N warm passes each, min + all passes reported, jobs
labelled via setJobDescription so a UI/event-log inspection can map
stages to entries.

Usage: python tools/entry_probe.py [sf_dir] [passes] <entry ...>
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tts_data_pipeline_spark.plans import catalog  # noqa: E402
from tts_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    passes = 3
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]
    if args and args[0].isdigit():
        passes, args = int(args[0]), args[1:]
    names = args
    spark = get_spark(app_name="entry_probe")
    from pyspark.sql import functions as F

    _warm = F.pandas_udf(lambda s: s, "long")
    n_workers = spark.sparkContext.defaultParallelism
    spark.range(0, n_workers * 100, 1, n_workers).select(
        F.sum(_warm(F.col("id")))
    ).collect()
    from tts_data_pipeline_spark.streaming.events import prestage_replays

    prestage_replays(spark, sf_dir)
    qs = catalog.queries()
    out = {}
    for name in names:
        ts = []
        for i in range(passes):
            spark.sparkContext.setJobDescription(f"{name} pass {i}")
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            ts.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(ts), "passes": ts}
        print(f"{name}: min {min(ts):.3f}s passes {ts}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
