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


def test_warn_if_quadratic_decision_rule():
    """r12 verdict #3: the route-away warning fires exactly when even the
    adaptive grid can't hold the hot bucket's per-cell rows at the
    pair-grid target — i.e. S_hot hits its clamp — and never otherwise."""
    import warnings as w

    from tts_data_pipeline_spark.operators.pairgrid import warn_if_quadratic

    # hot bucket fully absorbed by the grid: S_hot = ceil(8*1e6/1e3)
    # capped at 1024 -> 977 rows/cell > 256 target -> WARN
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        fired = warn_if_quadratic(
            "dedup_embedding_cosine", "dedup_embedding_cosine_ivf",
            n_max=1_000_000, mean_n=1_000.0, s=8, s_max=1024,
            cell_target=256,
        )
    assert fired and len(rec) == 1
    msg = str(rec[0].message)
    assert "dedup_embedding_cosine_ivf" in msg and "quadratic" in msg

    # same histogram, unclamped grid (s_max high enough): cells hold the
    # target -> silent
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        fired = warn_if_quadratic(
            "dedup_embedding_cosine", "dedup_embedding_cosine_ivf",
            n_max=1_000_000, mean_n=1_000.0, s=8, s_max=1 << 20,
            cell_target=256,
        )
    assert not fired and rec == []

    # absolute sizing mode uses n_max/target_rows for S_hot
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        fired = warn_if_quadratic(
            "lpa_cooc", "lpa_cooc", n_max=10_000, mean_n=10.0,
            s=1, s_max=4, cell_target=256, target_rows=256,
        )
    assert fired  # S_hot clamps at 4 -> 2500 rows/cell > 256

    # empty histogram never warns
    assert not warn_if_quadratic("x", "y", 0, 0.0, 8, 1024, 256)


def test_exact_twin_warns_at_scale_not_at_test_scale(spark):
    """The shipped exact twins stay SILENT on the test corpus (their
    buckets grid clean) but WARN when the hot-bucket mass exceeds what
    the clamped grid can spread — pinned via a lowered target dial, no
    semantics change (pair set identical either way)."""
    import pyspark.sql.functions as F
    import warnings as w

    rows = ["hot"] * 40 + ["cold"] * 2
    df = spark.createDataFrame(
        [(i, b) for i, b in enumerate(rows)], ["rid", "bucket"]
    )

    def run():
        joined = adaptive_grid_pair_join(
            df, bucket_cols=("bucket",), id_col="rid", s=1, s_max=2,
            warn_quadratic=("exact_twin", "ivf_sibling"),
        )
        return {
            (r.id_a, r.id_b)
            for r in joined.select(
                F.least(F.col("a.rid"), F.col("b.rid")).alias("id_a"),
                F.greatest(F.col("a.rid"), F.col("b.rid")).alias("id_b"),
            ).collect()
        }

    prev = spark.conf.get("spark.graft.pairgrid.target_rows", None)
    try:
        with w.catch_warnings(record=True) as rec:
            w.simplefilter("always")
            silent_pairs = run()  # default target 256: silent
        assert [r for r in rec if r.category is RuntimeWarning] == []

        spark.conf.set("spark.graft.pairgrid.target_rows", "4")
        with w.catch_warnings(record=True) as rec:
            w.simplefilter("always")
            warned_pairs = run()  # hot bucket: 40/S_hot=2 = 20 > 4
        fired = [r for r in rec if r.category is RuntimeWarning]
        assert len(fired) == 1 and "ivf_sibling" in str(fired[0].message)
    finally:
        if prev is None:
            spark.conf.unset("spark.graft.pairgrid.target_rows")
        else:
            spark.conf.set("spark.graft.pairgrid.target_rows", prev)
    assert warned_pairs == silent_pairs == _ground_truth(rows)
