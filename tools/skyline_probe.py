"""Monster-group stress probe for the skyline pair (round 14).

`agg_skyline_pareto`'s parallelism unit is the GROUP (window
partitionBy(p_brand)), so one dominant brand serializes its whole
frontier scan through a single window task — the failure mode
`agg_skyline_pareto_ranged` exists to remove.  The probe builds a part
corpus where ONE brand owns 90% of the rows (plus 24 normal brands),
times both forms on identical data, and asserts the frontiers match the
per-partition counts' sanity bound.  Results go to PLANS.md.

The synthetic prices draw from a wide integer-cents range so the range
sampler has real split points inside the hot brand; sizes draw 1..50.

Usage: python tools/skyline_probe.py [--rows 8000000] [--runs 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tts_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8_000_000)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark("skyline_probe", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    n = args.rows

    # 90% of rows in brand HOT; deterministic congruential columns so the
    # corpus is replayable without driver-side data generation
    base = spark.range(n)
    part = base.select(
        F.col("id").alias("p_partkey"),
        F.when(F.col("id") % 10 < 9, F.lit("HOT"))
        .otherwise(F.concat(F.lit("B"), (F.col("id") % 24).cast("string")))
        .alias("p_brand"),
        ((F.col("id") * 2654435761) % 1_000_000).alias("price_cents"),
        (1 + (F.col("id") * 40503) % 50).alias("p_size"),
    ).cache()
    part.count()

    from pyspark.sql import Window as W
    from tts_data_pipeline_spark.cachereg import cache_replacing

    def windowed(p):
        w_strict = (
            W.partitionBy("p_brand")
            .orderBy("price_cents")
            .rangeBetween(W.unboundedPreceding, -1)
        )
        w_incl = (
            W.partitionBy("p_brand")
            .orderBy("price_cents")
            .rangeBetween(W.unboundedPreceding, 0)
        )
        dom = F.coalesce(
            F.max("p_size").over(w_strict) >= F.col("p_size"), F.lit(False)
        ) | (F.max("p_size").over(w_incl) > F.col("p_size"))
        return p.withColumn("_dom", dom).filter(~F.col("_dom")).drop("_dom")

    def ranged(p):
        basep = cache_replacing(
            "skyline_probe_base",
            p.repartitionByRange("p_brand", "price_cents").withColumn(
                "pid", F.spark_partition_id()
            ),
        )
        gmax = basep.groupBy("pid", "p_brand").agg(F.max("p_size").alias("mx"))
        offsets = gmax.select(
            "pid",
            "p_brand",
            F.max("mx")
            .over(
                W.partitionBy("p_brand")
                .orderBy("pid")
                .rowsBetween(W.unboundedPreceding, -1)
            )
            .alias("off"),
        )
        w_strict = (
            W.partitionBy("pid", "p_brand")
            .orderBy("price_cents")
            .rangeBetween(W.unboundedPreceding, -1)
        )
        w_incl = (
            W.partitionBy("pid", "p_brand")
            .orderBy("price_cents")
            .rangeBetween(W.unboundedPreceding, 0)
        )
        dom = (
            F.coalesce(
                F.max("p_size").over(w_strict) >= F.col("p_size"), F.lit(False)
            )
            | (F.max("p_size").over(w_incl) > F.col("p_size"))
            | F.coalesce(F.col("off") >= F.col("p_size"), F.lit(False))
        )
        return (
            basep.join(F.broadcast(offsets), ["pid", "p_brand"])
            .withColumn("_dom", dom)
            .filter(~F.col("_dom"))
            .select("p_partkey", "p_brand", "price_cents", "p_size")
        )

    # order-proof integer checksum over the frontier (both forms must tie)
    def checksum(df):
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("p_partkey") * 31 + F.col("p_size")).alias("s"),
        ).collect()[0]
        return (r["n"], r["s"])

    results = {}
    for name, fn in (("windowed", windowed), ("ranged", ranged)):
        best = float("inf")
        chk = None
        for _ in range(args.runs):
            t0 = time.time()
            chk = checksum(fn(part))
            best = min(best, time.time() - t0)
        results[name] = (best, chk)
        print(f"{name}: {best:.2f}s frontier={chk}")
    assert results["windowed"][1] == results["ranged"][1], results
    print("frontiers identical; speedup %.2fx" % (results["windowed"][0] / results["ranged"][0]))


if __name__ == "__main__":
    main()
