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
    # Right-side columns ride as ONE struct so last(ignoreNulls) carries the
    # whole matched row atomically: the struct itself is non-null exactly on
    # right rows, so a NULL inside a right column stays NULL in the result
    # instead of leaking an older row's value into that one field.
    tagged_left = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        F.lit(None).alias("_r"),
    )
    tagged_right = right.select(
        *[
            F.col(c) if c in (key, ts) else F.lit(None).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_r"),
    )
    # unionByName needs matching types: cast the left's NULL to the struct
    rtype = dict(tagged_right.dtypes)["_r"]
    tagged_left = tagged_left.withColumn("_r", F.col("_r").cast(rtype))
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
        F.last("_r", ignorenulls=True).over(w).alias("_r"),
    )
    out = filled.filter(F.col("_side") == 1)
    return out.select(
        *lcols, *[F.col("_r")[c].alias(f"r_{c}") for c in right_cols]
    )


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
    verify.  A pair spanning several shared buckets is emitted only from its
    FIRST shared bucket (max of the two start buckets), so multi-bucket hits
    dedupe positionally and genuinely duplicate input rows still produce one
    output row each — row-identical to the theta join.  Expects numeric
    start/end columns; columns come back prefixed ``l_``/``r_``."""

    def bucketed(df: DataFrame, prefix: str) -> DataFrame:
        b = F.explode(
            F.sequence(
                F.floor(F.col(start) / bucket_width).cast("long"),
                F.floor(F.col(end) / bucket_width).cast("long"),
            )
        ).alias(f"{prefix}__bucket")
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
        (F.col(f"l_{key}") == F.col(f"r_{key}"))
        & (F.col("l__bucket") == F.col("r__bucket")),
    )
    overlap = (F.col(f"l_{start}") < F.col(f"r_{end}")) & (
        F.col(f"r_{start}") < F.col(f"l_{end}")
    )
    first_shared_bucket = F.greatest(
        F.floor(F.col(f"l_{start}") / bucket_width).cast("long"),
        F.floor(F.col(f"r_{start}") / bucket_width).cast("long"),
    )
    return (
        joined.filter(overlap & (F.col("l__bucket") == first_shared_bucket))
        .drop("l__bucket", "r__bucket")
    )
