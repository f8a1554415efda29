"""Edge cases for the as-of and interval join operators."""

from __future__ import annotations


from pyspark.sql import functions as F

from tts_data_pipeline_spark.operators.asof import asof_join, interval_join


def test_asof_basic_prior_match_and_null(spark):
    left = spark.createDataFrame(
        [("u1", 10, 100), ("u1", 5, 101), ("u2", 7, 102)],
        ["k", "ts", "lid"],
    )
    right = spark.createDataFrame(
        [("u1", 8, 7.0), ("u1", 2, 3.0), ("u2", 9, 9.9)],
        ["k", "ts", "val"],
    )
    out = {
        r.lid: r.r_val
        for r in asof_join(left, right, key="k", ts="ts", right_cols=("val",)).collect()
    }
    assert out[100] == 7.0  # latest right at ts<=10 is ts=8
    assert out[101] == 3.0  # latest right at ts<=5 is ts=2
    assert out[102] is None  # u2 has no right row at ts<=7


def test_asof_exact_tie_matches(spark):
    left = spark.createDataFrame([("u", 5, 1)], ["k", "ts", "lid"])
    right = spark.createDataFrame([("u", 5, 42.0)], ["k", "ts", "val"])
    out = asof_join(left, right, key="k", ts="ts", right_cols=("val",)).collect()
    assert out[0].r_val == 42.0  # <= semantics: equal ts matches


def test_asof_left_row_count_preserved(spark):
    left = spark.createDataFrame(
        [("u", i, i) for i in range(50)], ["k", "ts", "lid"]
    )
    right = spark.createDataFrame([("u", 25, 1.0)], ["k", "ts", "val"])
    out = asof_join(left, right, key="k", ts="ts", right_cols=("val",))
    assert out.count() == 50
    matched = out.filter("r_val IS NOT NULL").count()
    assert matched == 25  # ts 25..49


def test_interval_join_overlap_cases(spark):
    left = spark.createDataFrame(
        [("k", 0.0, 10.0, "a"), ("k", 100.0, 110.0, "b")],
        ["key", "start", "end", "lid"],
    )
    right = spark.createDataFrame(
        # overlaps a; touches a only at the open boundary (no overlap);
        # spans multiple buckets overlapping b
        [("k", 5.0, 6.0, "x"), ("k", 10.0, 12.0, "y"), ("k", 50.0, 105.0, "z")],
        ["key", "start", "end", "rid"],
    )
    out = interval_join(left, right, key="key", bucket_width=7.0)
    pairs = sorted((r.l_lid, r.r_rid) for r in out.collect())
    assert pairs == [("a", "x"), ("b", "z")]
    # multi-bucket span produced exactly one row (distinct collapsed)
    assert out.count() == 2


def test_asof_null_in_matched_right_row_stays_null(spark):
    """The matched right row's own NULL must come through — not an older
    row's value (right columns ride as one struct)."""
    left = spark.createDataFrame([("k", 10, 1)], ["k", "ts", "lid"])
    right = spark.createDataFrame(
        [("k", 2, 3.0, 2), ("k", 8, None, 8)], ["k", "ts", "val", "rid"]
    )
    out = asof_join(left, right, key="k", ts="ts", right_cols=("val", "rid")).collect()
    assert out[0].r_rid == 8
    assert out[0].r_val is None  # NOT 3.0 leaked from the older row


def test_interval_join_preserves_duplicate_rows(spark):
    """Genuinely duplicate input rows must produce one output row each,
    like the theta join (first-shared-bucket dedup, not row distinct)."""
    left = spark.createDataFrame(
        [("k", 0.0, 10.0, "a"), ("k", 0.0, 10.0, "a")],
        ["key", "start", "end", "lid"],
    )
    right = spark.createDataFrame([("k", 5.0, 6.0, "x")], ["key", "start", "end", "rid"])
    out = interval_join(left, right, key="key", bucket_width=3.0)
    assert out.count() == 2  # theta join would also emit 2


def test_salted_join_rejects_outer_how(spark):
    import pytest
    from tts_data_pipeline_spark.operators.skew import salted_join

    df = spark.range(5).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(df, df, on="k", how="full")
