"""Skew-mitigation join (100 TB design point; SURVEY.md §7 notes a few
narrators own hundreds of books — the classic hot-key shape).

``salted_join`` splits each hot left-side key across ``salt_buckets``
reducers by appending a deterministic salt to the join key, and replicates
the (small-ish) right side once per bucket.  Result is row-identical to the
plain join — only the partitioning changes — so it stays oracle-checkable.

AQE's skew-join splitting (on by default in our session factory) handles
moderate skew automatically; explicit salting is for the pathological case
where one key exceeds what one task can hold, and for engines/stages AQE
can't re-plan (e.g. aggregation buffers, not just joins)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_buckets: int = 8,
    salt_src: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``on`` with the left side salted across
    ``salt_buckets`` partitions per key.

    ``salt_src``: a left column whose hash picks the bucket — any column
    unique-ish within a key gives good spread.  Default: hash of ALL left
    columns.  The salt MUST be a deterministic function of the row: a
    nondeterministic source (e.g. ``spark_partition_id()``) re-salts rows
    into different reducers on stage retry/recompute, which can duplicate
    or drop rows (the SPARK-23207 failure class).

    Only ``inner`` and ``left`` joins are supported: the right side is
    replicated once per salt bucket, so a right/full outer join would emit
    each unmatched right row ``salt_buckets`` times.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r}: the "
            "replicated right side would duplicate unmatched right rows "
            "under right/full outer semantics"
        )
    src = (
        F.xxhash64(F.col(salt_src))
        if salt_src
        else F.xxhash64(*[F.col(c) for c in left.columns])
    )
    lsalted = left.withColumn("_salt", F.pmod(src, F.lit(salt_buckets)))
    rsalted = right.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<long>")),
    )
    return lsalted.join(rsalted, [on, "_salt"], how).drop("_salt")
