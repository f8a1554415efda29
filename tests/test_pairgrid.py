"""The generic adaptive grid (operators/pairgrid, round-11) must emit
EXACTLY every unordered within-bucket pair once, for any dial values, in
both sizing modes — the coverage proof's executable form, beside the
cosine-specific parameterized test in test_dedup_similarity.py."""

import itertools

import pytest

from tts_data_pipeline_spark.operators.pairgrid import adaptive_grid_pair_join


def _ground_truth(rows):
    want = set()
    for (i, bi), (j, bj) in itertools.combinations(enumerate(rows), 2):
        if bi == bj:
            want.add((min(i, j), max(i, j)))
    return want


@pytest.mark.parametrize(
    "s,s_max,target",
    [
        (8, 1024, None),   # shipped cosine (mean-relative) shape
        (1, 1024, 7),      # absolute mode, tiny target → grids everywhere
        (1, 3, 2),         # absolute mode with a binding s_max clamp
        (3, 4, None),      # relative mode with a binding clamp
        (1, 1, None),      # degenerate: plain bucketed join
    ],
)
def test_grid_modes_emit_exact_pair_set(spark, s, s_max, target):
    import pyspark.sql.functions as F

    # buckets with 1, 2, 7, and 40 members (singleton → no pairs; the
    # 40-member bucket exceeds every `target` above → multi-block cells)
    rows = (
        ["solo"] + ["duo"] * 2 + ["seven"] * 7 + ["big"] * 40
    )
    df = spark.createDataFrame(
        [(i, b) for i, b in enumerate(rows)], ["rid", "bucket"]
    )
    joined = adaptive_grid_pair_join(
        df, bucket_cols=("bucket",), id_col="rid",
        s=s, s_max=s_max, target_rows=target,
    )
    got = {
        (r.id_a, r.id_b)
        for r in joined.select(
            F.least(F.col("a.rid"), F.col("b.rid")).alias("id_a"),
            F.greatest(F.col("a.rid"), F.col("b.rid")).alias("id_b"),
        ).collect()
    }
    assert got == _ground_truth(rows)


def test_grid_two_bucket_cols_and_cache(spark):
    """Multi-column buckets join on ALL columns; the cache_name path
    returns the same pair set and plants an InMemoryRelation."""
    import pyspark.sql.functions as F

    rows = [(i, f"t{i % 3}", i % 2) for i in range(30)]
    df = spark.createDataFrame(rows, ["rid", "et", "h"])
    joined = adaptive_grid_pair_join(
        df, bucket_cols=("et", "h"), id_col="rid",
        s=1, s_max=64, target_rows=3, cache_name="pairgrid_test",
    )
    got = {
        (r.id_a, r.id_b)
        for r in joined.select(
            F.least(F.col("a.rid"), F.col("b.rid")).alias("id_a"),
            F.greatest(F.col("a.rid"), F.col("b.rid")).alias("id_b"),
        ).collect()
    }
    want = {
        (a[0], b[0])
        for a, b in itertools.combinations(rows, 2)
        if a[1:] == b[1:]
    }
    assert got == want
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan
