"""Adaptive grid-blocked unordered pair enumeration within buckets.

The library form of the round-9/10 fix for the two ways a bucketed
all-pairs self-join dies at scale:

1. **Few-key parallelism ceiling** — joining ``df ⋈ df`` on the bucket
   columns alone makes join parallelism = |buckets|; 10 labels capped
   the sf3 cosine verify at SEVEN tasks.  The 1-Bucket grid (Okcan &
   Riedewald, SIGMOD'11 "Processing Theta-Joins using MapReduce",
   specialized to the self-join triangle) splits each bucket's pair
   space into S(S+1)/2 cells so parallelism is Σ_b S_b(S_b+1)/2.
2. **Skewed-bucket re-cap** — with one GLOBAL S a Zipfian bucket
   histogram re-caps the verify: the hot bucket's Θ(n_b²) pair mass
   lands on the same S(S+1)/2 cells as every cold bucket's (measured on
   the label-skew decade: slope 1.66 / 286 s at skew-3 where uniform
   reads ~1.0).  The grid is therefore per-bucket ADAPTIVE:
   ``S_b = clamp(ceil(S · n_b / mean_n), S, S_max)`` from a broadcast
   bucket histogram, so per-cell pair mass stays ≈ (mean_n/S)²
   regardless of the histogram.  S_b is CONSTANT within a bucket, so
   the coverage argument below is untouched and the pair set is
   identical for any histogram (parameterized tests in
   tests/test_dedup_similarity.py and tests/test_components.py).

Grid coverage: row r gets block ``blk = hash(id) mod S_b``; a-side rows
in block i replicate to cells (i, j ≥ i), b-side rows in block j to
cells (i ≤ j, j); an unordered pair with blocks (i, j), i < j, meets
exactly once in cell (i, j) — in HASH order, so callers re-order ids
with least/greatest on output — and a same-block pair meets once in
cell (i, i) under the ``id_a < id_b`` predicate.

Histogram cost/ceiling: the histogram is one narrow aggregate over the
bucket columns (Catalyst prunes everything else), |buckets| rows ×
~16 B broadcast — fine to ~10M buckets; past that the average bucket is
tiny, adaptive S is moot (every S_b = S), and the right move is
dropping the pattern so AQE picks the join strategy.

Used by ``plans/coverage._embedding_cosine_pairs`` (cosine verify,
buckets = label) and ``plans/graphops.graph_label_propagation_converged``
(user co-occurrence, buckets = (event_type, hour)) — round-11: the
co-occurrence build was the last pair join whose bucket mass could grow
quadratically with nothing bounding it (users-per-(type, hour) grows
with corpus density while the event-type count stays fixed).
"""

from __future__ import annotations

import math
import warnings
from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def warn_if_quadratic(
    op_name: str,
    sibling: str,
    n_max: int,
    mean_n: float,
    s: int,
    s_max: int,
    cell_target: int,
    target_rows: int | None = None,
) -> bool:
    """Self-enforcing route-away warning for the EXACT all-pairs twins
    (r12 verdict #3).  The exact forms (``dedup_embedding_cosine``,
    ``dedup_semantic_clusters``) are documented as oracle-checkable
    contrast rows beside skew-immune IVF siblings — slope 1.0+ under a
    hot bucket is their SEMANTICS, not a plan defect — but nothing in
    the code used to tell a caller so at scale.  This fires (once) when
    even the adaptive grid cannot hold the hot bucket's per-cell pair
    mass at the pair-grid target: ``S_hot`` hits its clamp and
    ``n_max / S_hot > cell_target`` rows per cell, i.e. each grid cell
    still carries > cell_target²/2 candidate pairs.  Pure decision
    function (no Spark) so the rule is unit-testable; returns whether
    the warning fired.  No semantics change — the pair set is emitted
    either way."""
    if n_max <= 0:
        return False
    if target_rows is not None:  # absolute sizing mode (many-bucket)
        s_raw = int(math.ceil(n_max / target_rows))
    else:  # mean-relative sizing mode (few-bucket, the cosine form)
        s_raw = int(math.ceil(s * n_max / max(mean_n, 1.0)))
    s_hot = max(s, min(s_raw, s_max))
    cell_rows = n_max / s_hot
    if cell_rows <= cell_target:
        return False
    warnings.warn(
        f"{op_name}: hot bucket has {n_max} rows -> ~{cell_rows:.0f} rows "
        f"(~{cell_rows * cell_rows / 2:.2e} candidate pairs) per grid cell "
        f"after adaptive S={s_hot}; exact within-bucket all-pairs is "
        f"quadratic in the hot bucket by semantics. At this scale prefer "
        f"the data-scaled sibling `{sibling}` (raise "
        f"spark.graft.pairgrid.target_rows to silence).",
        RuntimeWarning,
        stacklevel=3,
    )
    return True


def adaptive_grid_pair_join(
    df: DataFrame,
    bucket_cols: Sequence[str],
    id_col: str,
    s: int,
    s_max: int,
    target_rows: int | None = None,
    cache_name: str | None = None,
    warn_quadratic: tuple[str, str] | None = None,
) -> DataFrame:
    """Self-join ``df`` into every unordered within-bucket pair, grid-
    blocked (module docstring).  Returns the joined frame with sides
    aliased ``a`` / ``b`` — callers select payload via ``F.col("a.x")``
    and MUST normalize ids with least/greatest (cross-cell pairs meet in
    hash order, not id order).  Grid dials are physical-only: any
    (s, s_max, target_rows) yields the IDENTICAL pair set.

    Two sizing modes, one per failure shape:

    - ``target_rows=None`` (mean-relative, the cosine form):
      ``S_b = clamp(ceil(s · n_b/mean_n), s, s_max)`` — for FEW-bucket
      joins (10 labels) where the baseline ``s`` buys parallelism and
      skew scales the hot bucket.  Under uniform k× density growth
      every S_b stays ``s`` and cell mass grows k² — there, raise ``s``
      with the deployment (the documented grid trade).
    - ``target_rows=T`` (absolute): ``S_b = clamp(ceil(n_b/T), s, s_max)``
      with ``s`` as the floor (pass 1) — for MANY-bucket joins (the LPA
      (event_type, hour) co-occurrence) where bucket count already
      saturates parallelism and the risk is bucket DENSITY: cell pair
      mass stays ≈ T² and replication per row ≈ n_b/T (≤ 2/T of the
      bucket's inherent pair mass) no matter how the histogram moves —
      buckets under T rows get S_b = 1, i.e. exactly the plain bucketed
      join with zero replication.

    ``cache_name`` caches the enriched single-side frame via the
    replace-on-reinvoke registry — both explode sides reference it, so
    without the cache the upstream subtree (often a distinct/shuffle)
    runs twice (the subtree-recompute class).

    CONTRACT NOTE (r13 advice): with ``warn_quadratic`` set, building
    the plan runs ONE EAGER narrow aggregate over the bucket histogram
    (``.first()`` below) — plan construction is not fully lazy.  The
    histogram is registered in the cache registry (``<cache_name>__hist``)
    so the eager pass fills a cache that the join's broadcast side and
    every repeat build (bench min-of-N, driver re-runs) then read — the
    upstream subtree scans once per distinct plan, not once per build.
    """
    from tts_data_pipeline_spark.cachereg import cache_replacing

    bucket_cols = list(bucket_cols)
    hist = df.groupBy(*bucket_cols).agg(F.count(F.lit(1)).alias("n_b"))
    if cache_name is not None:
        hist = cache_replacing(f"{cache_name}__hist", hist)
    if warn_quadratic is not None:
        # one narrow aggregate over the (cached) bucket histogram —
        # Catalyst prunes the payload; repeat builds hit the cache
        from tts_data_pipeline_spark.conf import PAIRGRID_TARGET_ROWS, dial

        stats = hist.agg(
            F.max("n_b").alias("n_max"), F.avg("n_b").alias("mean_n")
        ).first()
        if stats is not None and stats["n_max"] is not None:
            op_name, sibling = warn_quadratic
            warn_if_quadratic(
                op_name,
                sibling,
                int(stats["n_max"]),
                float(stats["mean_n"]),
                s,
                s_max,
                dial(df.sparkSession, PAIRGRID_TARGET_ROWS),
                target_rows=target_rows,
            )
    if target_rows is None:
        s_b = F.ceil(F.lit(s) * F.col("n_b") / F.col("mean_n"))
        hist = hist.join(
            F.broadcast(hist.agg(F.avg("n_b").alias("mean_n")))
        )
    else:
        s_b = F.ceil(F.col("n_b") / F.lit(target_rows))
    hist = hist.select(
        *bucket_cols,
        F.least(F.greatest(s_b, F.lit(s)), F.lit(s_max))
        .cast("int")
        .alias("s_b"),
    )
    e = df.join(F.broadcast(hist), bucket_cols).withColumn(
        "blk", F.pmod(F.xxhash64(id_col), F.col("s_b")).cast("int")
    )
    if cache_name is not None:
        e = cache_replacing(cache_name, e)
    a = e.withColumn(
        "gj", F.explode(F.sequence(F.col("blk"), F.col("s_b") - 1))
    ).alias("a")
    b = e.withColumn(
        "gi", F.explode(F.sequence(F.lit(0), F.col("blk")))
    ).alias("b")
    cond: Column = reduce(
        lambda acc, c: acc & (F.col(f"a.{c}") == F.col(f"b.{c}")),
        bucket_cols[1:],
        F.col(f"a.{bucket_cols[0]}") == F.col(f"b.{bucket_cols[0]}"),
    )
    cond = (
        cond
        & (F.col("a.gj") == F.col("b.blk"))
        & (F.col("a.blk") == F.col("b.gi"))
        # same-cell pairs order by id; cross-cell pairs are already
        # unique (each unordered pair meets in exactly one cell)
        & (
            (F.col("a.blk") != F.col("b.blk"))
            | (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        )
    )
    return a.join(b, cond)
