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

    ``salt_src``: a left column whose hash picks the bucket (defaults to the
    whole row being deterministic isn't required — any column unique-ish
    within a key works; correctness never depends on the salt value, only
    distribution quality does).

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
    src = F.col(salt_src) if salt_src else F.spark_partition_id()
    lsalted = left.withColumn(
        "_salt", F.pmod(F.xxhash64(src), F.lit(salt_buckets))
    )
    rsalted = right.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<long>")),
    )
    return lsalted.join(rsalted, [on, "_salt"], how).drop("_salt")
