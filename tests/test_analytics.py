"""Analytics-operator invariants that the full oracle sweep can't see:
floating-point interpolation-form parity for the exact median (the sweep
would only catch a divergence if the driver corpus happened to produce a
last-ulp-straddling bracket; this pins the form on adversarial values).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest


def test_exact_median_interpolation_form_matches_duckdb(spark):
    """_exact_median must compute lo*(1-frac) + hi*frac — the form DuckDB
    1.0.0's quantile_cont uses — NOT lo + (hi-lo)*frac, which carries two
    roundings and diverges in the last ulp on magnitude-spread brackets.
    The unrounded median feeds strict comparisons (ev_anomaly_mad's
    ad > 3*mad), so a one-ulp divergence would flip counts between
    engines.  Brackets here are chosen so the two forms actually differ
    (tiny lo, large hi: hi-lo is inexact)."""
    from tts_data_pipeline_spark.plans.analytics import _exact_median

    import random

    rng = random.Random(7)
    rows = []
    gid = 0
    adversarial = 0
    while gid < 40:
        lo = rng.random() * 1e-3
        hi = rng.random() * 1e3
        if lo > hi:
            lo, hi = hi, lo
        # keep only brackets where the two interpolation forms differ —
        # otherwise the test passes vacuously
        if lo * 0.5 + hi * 0.5 != lo + (hi - lo) * 0.5:
            adversarial += 1
        rows.append(("g%03d" % gid, lo))
        rows.append(("g%03d" % gid, hi))
        gid += 1
    assert adversarial >= 5, "corpus has no form-distinguishing brackets"

    pdf = pd.DataFrame(rows, columns=["k", "v"])
    sdf = spark.createDataFrame(pdf)
    got = (
        _exact_median(sdf, "k", "v", "med")
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )

    con = duckdb.connect()
    con.register("t", pdf)
    want = con.sql(
        "SELECT k, quantile_cont(v, 0.5) AS med FROM t GROUP BY k ORDER BY k"
    ).df()
    con.close()

    # bit-exact, not approx: the whole point is last-ulp parity
    assert list(got["k"]) == list(want["k"])
    for g, a, b in zip(got["k"], got["med"], want["med"]):
        assert a == b, f"{g}: spark {a.hex()} != duckdb {b.hex()}"


def test_exact_median_odd_group_passes_value_through(spark):
    """frac = 0 brackets (odd n): the middle value must pass through
    bit-exactly (x * 1.0, no interpolation residue)."""
    from tts_data_pipeline_spark.plans.analytics import _exact_median

    vals = [0.1 + 1e-17, 7.774444e11, 3.0000000000000004]
    pdf = pd.DataFrame({"k": ["a"] * 3, "v": vals})
    got = _exact_median(spark.createDataFrame(pdf), "k", "v", "med").toPandas()
    assert got["med"][0] == sorted(vals)[1]


def test_weighted_reservoir_prefers_heavy_rows(spark):
    """A-ES inclusion must follow the weights: with two weight classes
    1000:10 and k = half the rows, essentially every heavy row is
    sampled and heavy rows dominate the sample far beyond their count
    share.  Deterministic (md5-keyed draws), so exact counts are
    stable."""
    import tempfile

    from pyspark.sql import functions as F

    from tts_data_pipeline_spark.plans.curation import (
        _RES_K,
        _res_key_col,
    )

    rows = [(i, "heavy" if i % 4 == 0 else "light",
             1000 if i % 4 == 0 else 10) for i in range(800)]
    d = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    sampled = (
        d.select("doc_id", "source", "n_chars", _res_key_col().alias("key"))
        .orderBy(F.desc("key"), "doc_id")
        .limit(_RES_K)
    ).collect()
    n_heavy = sum(1 for r in sampled if r.source == "heavy")
    # 200 heavy rows of weight 1000 vs 600 light of weight 10: the top
    # 200 keys should be nearly all heavy (P(light beats heavy) tiny)
    assert n_heavy >= 180, n_heavy
    # keys are strictly negative (log-domain) and sorted descending
    keys = [r.key for r in sampled]
    assert all(k < 0 for k in keys)
    assert keys == sorted(keys, reverse=True)


def test_sample_hash_parity_beyond_int32_orderkeys(spark):
    """r13 advice: the Bernoulli sampling hash used by agg_sample_estimate
    multiplied the raw row key by the Knuth constant — past l_orderkey
    ~4.3e8 the product leaves int64, Spark wraps silently (negative
    remainders -> in_sample false) while DuckDB raises on BIGINT overflow.
    The fixed form bounds the key mod 2^31 first, so the product provably
    fits on BOTH engines.  Probe with orderkeys far beyond the overflow
    point (up to ~9.2e17, the 100 TB regime) and require bit-identical
    in_sample decisions from Spark and DuckDB."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(13)
    rows = [
        (rng.randrange(1, 9_200_000_000_000_000_00), rng.randrange(1, 8))
        for _ in range(500)
    ]
    # include the exact old overflow frontier and int32/int64-edge keys
    rows += [(429_496_729, 6), (2_147_483_647, 7), (1_152_921_504_606_846_975, 1)]
    pdf = pd.DataFrame(rows, columns=["l_orderkey", "l_linenumber"])

    sdf = spark.createDataFrame(pdf)
    expr = (
        ((F.col("l_orderkey") * 8 + F.col("l_linenumber")) % F.lit(2147483648))
        * F.lit(2654435761)
    ) % 1000 < 100
    got = (
        sdf.select("l_orderkey", "l_linenumber", expr.alias("in_sample"))
        .orderBy("l_orderkey", "l_linenumber")
        .toPandas()
    )

    con = duckdb.connect()
    con.register("t", pdf)
    want = con.sql(
        """
        SELECT l_orderkey, l_linenumber,
               (((l_orderkey * 8 + l_linenumber) % 2147483648)
                * 2654435761) % 1000 < 100 AS in_sample
        FROM t ORDER BY l_orderkey, l_linenumber
        """
    ).df()
    con.close()

    assert list(got["in_sample"]) == list(want["in_sample"])
    # the sample must not be degenerate (the wrap bug zeroed it out)
    frac = sum(got["in_sample"]) / len(got)
    assert 0.05 < frac < 0.2, frac
