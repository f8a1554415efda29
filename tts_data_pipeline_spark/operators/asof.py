"""As-of and interval joins — the time-series operators Spark lacks
natively, built scalably from sort/window and bucket primitives.

**As-of join** (each left row matches the latest right row with
``right.ts <= left.ts`` per key): the naive formulation is a per-row
backward search (O(n·m) or an unbounded range join).  The scalable form
used here is the union-tag trick: union both sides, sort by (key, ts,
side-priority) once, and propagate the most recent right-side values with
``last_value(..., ignoreNulls)`` over an unbounded-preceding window — ONE
shuffle on the key, no range explosion, identical semantics to DuckDB's
native ``ASOF JOIN``.

**Interval join** (pairs overlapping in time): the naive theta join is a
cartesian filter.  Here each interval lands in the ``width``-sized time
buckets it spans (explode), candidates meet in an equi-join on
(key, bucket), overlap is verified exactly, and duplicates from
multi-bucket spans are dropped — O(n·buckets_per_row) shuffle, the same
bounded-candidate pattern the dedup stack uses."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str = "ts",
    right_cols: tuple[str, ...] = (),
) -> DataFrame:
    """For every left row, attach the latest right row with
    ``right.ts <= left.ts`` within ``key``.  Left rows with no prior right
    row keep NULLs (left-outer as-of semantics)."""
    lcols = [c for c in left.columns]
    tagged_left = left.select(
        *lcols, F.lit(1).alias("_side"), *[F.lit(None).alias(f"_r_{c}") for c in right_cols]
    )
    tagged_right = right.select(
        *[
            F.col(c) if c in (key, ts) else F.lit(None).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    unioned = tagged_left.unionByName(tagged_right)
    # right rows sort before left rows at the same timestamp, so an exact
    # ts tie matches (<= semantics, like DuckDB ASOF)
    w = (
        W.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = unioned.select(
        *lcols,
        "_side",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_r_{c}")
            for c in right_cols
        ],
    )
    out = filled.filter(F.col("_side") == 1).drop("_side")
    for c in right_cols:
        out = out.withColumnRenamed(f"_r_{c}", f"r_{c}")
    return out


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    start: str = "start",
    end: str = "end",
    bucket_width: float = 60.0,
) -> DataFrame:
    """Overlapping-interval pairs within ``key``: ``l.start < r.end AND
    r.start < l.end`` — candidates via time-bucket equi-join, exact overlap
    verify, distinct to collapse multi-bucket hits.  Expects numeric
    start/end columns; left/right columns come back prefixed ``l_``/``r_``."""

    def bucketed(df: DataFrame, prefix: str) -> DataFrame:
        b = F.explode(
            F.sequence(
                F.floor(F.col(start) / bucket_width).cast("long"),
                F.floor(F.col(end) / bucket_width).cast("long"),
            )
        ).alias("_bucket")
        return df.select(
            F.col(key).alias(f"{prefix}_{key}"),
            F.col(start).alias(f"{prefix}_{start}"),
            F.col(end).alias(f"{prefix}_{end}"),
            *[
                F.col(c).alias(f"{prefix}_{c}")
                for c in df.columns
                if c not in (key, start, end)
            ],
            b,
        )

    lb = bucketed(left, "l")
    rb = bucketed(right, "r")
    joined = lb.join(
        rb,
        (lb[f"l_{key}"] == rb[f"r_{key}"]) & (lb["_bucket"] == rb["_bucket"]),
    ).drop("_bucket")
    overlap = (F.col(f"l_{start}") < F.col(f"r_{end}")) & (
        F.col(f"r_{start}") < F.col(f"l_{end}")
    )
    return joined.filter(overlap).distinct()
