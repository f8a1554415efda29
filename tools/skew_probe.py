"""30%-hot-key stress probe for the join family (r13 verdict #6).

The Zipf(1.1) skew replicas (`gen_scale_data.make_skewed`) stress the
whole histogram; this probe isolates the single-hot-key regime — ONE key
owning 30% of the fact side, the shape that serializes a sort-merge join
on one reducer — and pins the engineering claims behind two catalog
entries:

* `j8_salted_skew_join` (operators/skew.salted_join): the salt path must
  BEAT AQE-alone on the probe, not merely tie it — otherwise the salted
  operator is dead weight and AQE (`spark.sql.adaptive.skewJoin`) is the
  only story.  Four variants timed on identical data: plain sort-merge
  with AQE skew-split {on, off}, salted(8) with AQE {off, on}.
* `j14_bucketed_colocated_join` (plans/scansinks): bucketed layouts are
  shuffle-FREE, which also makes them skew-BLIND — AQE's skew split
  operates on shuffle exchanges, and a bucketed join has none, so the
  hot bucket serializes on one task.  The probe times the bucketed join
  against plain-parquet + AQE on the same hot data, quantifying the
  co-location/adaptivity trade the entry's docstring claims.

Broadcast is suppressed (`autoBroadcastJoinThreshold=-1`): the probe
models the fact-fact regime where the right side does not fit an
executor — with a broadcastable dim, broadcasting IS the skew fix and
none of this machinery applies.

Results go to PLANS.md (the r13 verdict's "done" condition).

Usage: python tools/skew_probe.py [--rows 3000000] [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tts_data_pipeline_spark.operators.skew import salted_join  # noqa: E402
from tts_data_pipeline_spark.session import get_spark  # noqa: E402

HOT_KEY = 1
HOT_FRAC = 0.30


def build_probe_tables(spark, root: str, n_rows: int) -> tuple[str, str]:
    """Fact table: ``n_rows`` rows, 30% on HOT_KEY, the rest uniform over
    ``n_rows // 10`` cold keys.  Dim side: one row per distinct key (too
    many to broadcast under the suppressed threshold).  Both written to
    parquet so every variant reads identical bytes (no lineage reuse)."""
    n_hot = int(n_rows * HOT_FRAC)
    n_keys = max(n_rows // 10, 2)
    fact = (
        spark.range(n_rows)
        .select(
            F.when(F.col("id") < n_hot, F.lit(HOT_KEY))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_keys)) + 2)
            .alias("key"),
            F.col("id").alias("row_id"),
            (F.pmod(F.xxhash64("id", F.lit(7)), F.lit(10000)) / 100.0).alias(
                "qty"
            ),
        )
    )
    dim = spark.range(1, n_keys + 2).select(
        F.col("id").alias("key"),
        F.concat(F.lit("s"), (F.col("id") % 5).cast("string")).alias(
            "status"
        ),
    )
    fact_path = os.path.join(root, "fact")
    dim_path = os.path.join(root, "dim")
    fact.write.mode("overwrite").parquet(fact_path)
    dim.write.mode("overwrite").parquet(dim_path)
    return fact_path, dim_path


def checksum_join(joined) -> tuple[int, int]:
    """Materialize the join through an order-proof integer checksum that
    needs columns from BOTH sides (nothing prunable)."""
    row = joined.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.xxhash64("row_id", "status") % F.lit(1_000_003)
        ).alias("chk"),
    ).first()
    return int(row["n"]), int(row["chk"])


def timed(fn, runs: int) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=3_000_000)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark()
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # make the hot reducer visible at probe size: default AQE coalescing
    # at 32 shuffle partitions hides nothing, but pin the count anyway
    spark.conf.set("spark.sql.shuffle.partitions", "32")

    root = tempfile.mkdtemp(prefix="skew_probe_")
    try:
        fact_path, dim_path = build_probe_tables(spark, root, args.rows)
        fact = spark.read.parquet(fact_path)
        dim = spark.read.parquet(dim_path)

        expected: dict[str, tuple[int, int]] = {}
        results: dict[str, float] = {}

        def set_aqe(skew_on: bool, tuned: bool = False) -> None:
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.enabled",
                "true" if skew_on else "false",
            )
            # defaults: a partition is "skewed" only above 5x median AND
            # 256 MB — a 30%-hot partition of a ~0.7 GB shuffle sits
            # UNDER that byte floor, so default AQE never splits it.
            # The tuned variant lowers the floors to give AQE its best
            # case; production would have to know to do this.
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
                "16MB" if tuned else "256MB",
            )
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
                "2" if tuned else "5",
            )
            spark.conf.set(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes",
                "16MB" if tuned else "64MB",
            )

        def plain():
            return fact.join(dim, "key")

        def salted():
            return salted_join(fact, dim, on="key", salt_buckets=8,
                               salt_src="row_id")

        variants = [
            ("plain_aqe_skew_on", plain, True, False),
            ("plain_aqe_skew_tuned", plain, True, True),
            ("plain_aqe_skew_off", plain, False, False),
            ("salted8_aqe_skew_off", salted, False, False),
            ("salted8_aqe_skew_on", salted, True, False),
        ]
        for name, builder, skew_on, tuned in variants:
            set_aqe(skew_on, tuned)
            expected[name] = checksum_join(builder())  # warm + correctness
            results[name] = timed(lambda: checksum_join(builder()),
                                  args.runs)
        assert len(set(expected.values())) == 1, (
            f"variants disagree: {expected}"
        )

        # ---- j14 shape: bucketed co-located join vs plain + AQE --------
        # explicit path option per table (warehouse.dir is static conf)
        wh = os.path.join(root, "wh")
        for t in ("skewprobe_fact_b", "skewprobe_dim_b"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        (
            fact.write.format("parquet")
            .bucketBy(8, "key")
            .sortBy("key")
            .option("path", os.path.join(wh, "fact_b"))
            .saveAsTable("skewprobe_fact_b")
        )
        (
            dim.write.format("parquet")
            .bucketBy(8, "key")
            .sortBy("key")
            .option("path", os.path.join(wh, "dim_b"))
            .saveAsTable("skewprobe_dim_b")
        )
        fb, db = spark.table("skewprobe_fact_b"), spark.table(
            "skewprobe_dim_b"
        )

        def bucketed():
            return fb.join(db, "key")

        set_aqe(True)
        expected["bucketed_hot"] = checksum_join(bucketed())
        results["bucketed_hot"] = timed(
            lambda: checksum_join(bucketed()), args.runs
        )
        assert expected["bucketed_hot"] == expected["plain_aqe_skew_on"]

        print(
            json.dumps(
                {
                    "metric": "skew_probe_30pct_hot_key",
                    "rows": args.rows,
                    "hot_frac": HOT_FRAC,
                    "runs_min_of": args.runs,
                    "join_rows": expected["plain_aqe_skew_on"][0],
                    "seconds": results,
                },
                indent=1,
            )
        )
    finally:
        for t in ("skewprobe_fact_b", "skewprobe_dim_b"):
            try:
                spark.sql(f"DROP TABLE IF EXISTS {t}")
            except Exception:
                pass
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
