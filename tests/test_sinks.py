"""Round-trip tests for the sink operators (SURVEY.md §2.2, K1-K7)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from tts_data_pipeline_spark import sinks

BOOKS = [
    (1, "book-a", "n1", ["u1", "u2"]),
    (2, "book-b", "n1", ["u3"]),
    (3, "book-c", "n2", []),
]
SCHEMA = T.StructType(
    [
        T.StructField("book_id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("narrator_id", T.StringType()),
        T.StructField("urls", T.ArrayType(T.StringType())),
    ]
)


def test_write_csv_json_encodes_nested(spark, tmp_path):
    df = spark.createDataFrame(BOOKS, SCHEMA)
    out = str(tmp_path / "csv")
    sinks.write_csv(df, out)
    back = spark.read.option("header", "true").csv(out)
    # nested column came back as JSON text; from_json restores it losslessly
    restored = back.withColumn(
        "urls", F.from_json("urls", T.ArrayType(T.StringType()))
    )
    rows = {r.book_id: r.urls for r in restored.collect()}
    assert rows["1"] == ["u1", "u2"] and rows["3"] == []


def test_write_json_records_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(BOOKS, SCHEMA)
    out = str(tmp_path / "jsonl")
    sinks.write_json_records(df, out)
    back = spark.read.json(out)
    assert back.count() == 3
    assert {r.name for r in back.collect()} == {"book-a", "book-b", "book-c"}


def test_write_lines_one_value_per_line(spark, tmp_path):
    df = spark.createDataFrame(BOOKS, SCHEMA)
    out = str(tmp_path / "txt")
    sinks.write_lines(df, "name", out)
    lines = []
    for f in glob.glob(os.path.join(out, "part-*")):
        lines += open(f).read().splitlines()
    assert sorted(lines) == ["book-a", "book-b", "book-c"]


def test_write_partitioned_dataset_layout_and_pruning(spark, tmp_path):
    df = spark.createDataFrame(BOOKS, SCHEMA)
    out = str(tmp_path / "ds")
    sinks.write_partitioned_dataset(df, out, partition_col="narrator_id")
    # Hive-style speaker directories exist (K7 layout)
    assert os.path.isdir(os.path.join(out, "narrator_id=n1"))
    back = spark.read.parquet(out).filter(F.col("narrator_id") == "n1")
    assert back.count() == 2
    # partition filter prunes to the n1 directory only
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "n2" not in plan


def test_write_hf_dataset_class_encodes_speaker(spark, tmp_path):
    df = spark.createDataFrame(
        [("s2", 1.0), ("s1", 2.0), ("s2", 3.0)], ["speaker", "duration"]
    )
    out = str(tmp_path / "hf")
    sinks.write_hf_dataset(df, out, class_col="speaker")
    back = spark.read.parquet(out)
    got = {(r.speaker, r.speaker_label) for r in back.collect()}
    # labels dense-ranked by sorted speaker name: s1 → 0, s2 → 1
    assert got == {("s1", 0), ("s2", 1), ("s2", 1)}


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key must sort-merge join with NO
    shuffle exchange — the co-located-join layout for 100 TB fact-fact
    joins."""
    from tts_data_pipeline_spark.sinks.writers import write_bucketed_table

    li = spark.createDataFrame(
        [(i % 50, i, float(i)) for i in range(500)], ["orderkey", "line", "qty"]
    )
    o = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(50)], ["orderkey", "status"]
    )
    write_bucketed_table(li, "t_li_bucketed", "orderkey", 8, sort_col="orderkey")
    write_bucketed_table(o, "t_o_bucketed", "orderkey", 8, sort_col="orderkey")
    try:
        # disable broadcast so the join would otherwise shuffle both sides
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("t_li_bucketed").join(
            spark.table("t_o_bucketed"), "orderkey"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, f"unexpected shuffle:\n{plan}"
        assert joined.count() == 500
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_li_bucketed")
        spark.sql("DROP TABLE IF EXISTS t_o_bucketed")


def test_spread_targets_cluster_parallelism(spark):
    """spread() round-robins to max(min_partitions, defaultParallelism)
    with no partition-count probe (no RDD materialization on the hot
    path): the exchange is unconditional and exactly sized."""
    from tts_data_pipeline_spark.sources.readers import spread

    par = spark.sparkContext.defaultParallelism
    df = spark.range(1000).coalesce(1)
    assert spread(df).rdd.getNumPartitions() == par
    assert spread(df, min_partitions=par + 7).rdd.getNumPartitions() == par + 7
    # a floor below the cluster's parallelism never narrows the exchange
    assert spread(df, min_partitions=1).rdd.getNumPartitions() == par


def test_merge_into_partitioned_prunes_untouched_partitions(spark, tmp_path):
    """merge_into_partitioned: touched partitions are rewritten with the
    upsert applied; untouched partition files are BYTE-IDENTICAL afterwards
    (never read, never rewritten)."""
    import hashlib

    target = str(tmp_path / "merge_target")
    base = spark.createDataFrame(
        [
            (1, "old-a", "n1"),
            (2, "old-b", "n1"),
            (3, "old-c", "n2"),
            (4, "old-d", "n3"),
        ],
        "book_id long, name string, narrator_id string",
    )
    base.repartition(2).write.partitionBy("narrator_id").parquet(target)

    def snapshot(part):
        files = sorted(glob.glob(os.path.join(target, f"narrator_id={part}", "*")))
        return [
            (os.path.basename(f), hashlib.sha256(open(f, "rb").read()).hexdigest())
            for f in files
        ]

    before_n2 = snapshot("n2")
    before_n3 = snapshot("n3")

    updates = spark.createDataFrame(
        [
            (2, "new-b", "n1"),   # update existing key in n1
            (5, "new-e", "n1"),   # insert new key into n1
        ],
        "book_id long, name string, narrator_id string",
    )
    sinks.merge_into_partitioned(
        spark, updates, target, key_col="book_id", partition_col="narrator_id"
    )

    # untouched partitions: identical file listing and bytes
    assert snapshot("n2") == before_n2
    assert snapshot("n3") == before_n3

    after = {
        r.book_id: (r.name, r.narrator_id)
        for r in spark.read.parquet(target).collect()
    }
    assert after == {
        1: ("old-a", "n1"),
        2: ("new-b", "n1"),
        3: ("old-c", "n2"),
        4: ("old-d", "n3"),
        5: ("new-e", "n1"),
    }


def test_merge_into_partitioned_new_partition(spark, tmp_path):
    """Updates landing in a brand-new partition value create it without
    touching any existing partition."""
    target = str(tmp_path / "merge_target2")
    spark.createDataFrame(
        [(1, "a", "n1")], "book_id long, name string, narrator_id string"
    ).write.partitionBy("narrator_id").parquet(target)
    updates = spark.createDataFrame(
        [(9, "z", "n9")], "book_id long, name string, narrator_id string"
    )
    sinks.merge_into_partitioned(
        spark, updates, target, key_col="book_id", partition_col="narrator_id"
    )
    after = {
        r.book_id: r.narrator_id for r in spark.read.parquet(target).collect()
    }
    assert after == {1: "n1", 9: "n9"}


def test_zorder_layout_skips_files_on_secondary_column(spark, tmp_path):
    """Z-order vs 1-D sort: under a selective predicate on the SECOND
    clustered column, parquet footer stats must let the Z-order layout
    skip most files, while the 1-D-sorted-by-first-column layout leaves
    (nearly) every file a candidate."""
    import pyarrow.parquet as pq
    import os
    from pyspark.sql import functions as F

    n_files = 16
    df = (
        spark.range(0, 40_000)
        .select(
            (F.col("id") % 200).cast("double").alias("x"),
            (F.col("id") / 200).cast("double").alias("y"),
        )
    )
    zpath, spath = str(tmp_path / "zorder"), str(tmp_path / "sorted")
    sinks.write_zorder_layout(df, zpath, cols=("x", "y"), n_files=n_files)
    (
        df.repartitionByRange(n_files, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(spath)
    )

    def files_matching(path, lo, hi):
        hits, total = 0, 0
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            total += 1
            md = pq.read_metadata(os.path.join(path, f))
            fmin = min(
                md.row_group(i).column(1).statistics.min
                for i in range(md.num_row_groups)
            )
            fmax = max(
                md.row_group(i).column(1).statistics.max
                for i in range(md.num_row_groups)
            )
            if fmax >= lo and fmin <= hi:
                hits += 1
        return hits, total

    z_hits, z_total = files_matching(zpath, 10.0, 20.0)
    s_hits, s_total = files_matching(spath, 10.0, 20.0)
    assert z_total >= n_files // 2 and s_total >= n_files // 2
    # y-range covers ~5% of the domain: z-order should skip most files;
    # the x-sorted layout interleaves y everywhere so ~all files match
    assert z_hits <= z_total // 2, (z_hits, z_total)
    assert s_hits >= s_total - 1, (s_hits, s_total)
    assert z_hits < s_hits
    # layout changes bytes, not rows: both round-trip the full dataset
    assert spark.read.parquet(zpath).count() == 40_000


def test_merge_tombstone_journal_handles_mobile_keys(spark, tmp_path):
    """A key moving across partitions leaves a stale row in the old
    partition on disk (Hive dynamic-overwrite semantics) — but the
    tombstone journal + read_merged_partitioned shows exactly one live
    row, in the key's latest partition, across repeated moves."""
    target = str(tmp_path / "merge_mobile")
    spark.createDataFrame(
        [(1, "a", "n1"), (2, "b", "n1"), (3, "c", "n2")],
        "book_id long, name string, narrator_id string",
    ).write.partitionBy("narrator_id").parquet(target)

    # move key 2 from n1 -> n9; n1 is NOT otherwise touched, so dynamic
    # overwrite never rewrites it and the stale row survives on disk
    sinks.merge_into_partitioned(
        spark,
        spark.createDataFrame(
            [(2, "b-moved", "n9")],
            "book_id long, name string, narrator_id string",
        ),
        target,
        key_col="book_id",
        partition_col="narrator_id",
    )
    # raw read documents the hole: key 2 appears in BOTH n1 and n9
    raw = spark.read.parquet(target).filter("book_id = 2").collect()
    assert {r.narrator_id for r in raw} == {"n1", "n9"}

    live = sinks.read_merged_partitioned(
        spark, target, key_col="book_id", partition_col="narrator_id"
    )
    rows = {r.book_id: (r.name, r.narrator_id) for r in live.collect()}
    assert rows == {
        1: ("a", "n1"),
        2: ("b-moved", "n9"),
        3: ("c", "n2"),
    }
    assert live.filter("book_id = 2").count() == 1

    # move key 2 BACK n9 -> n1: the later journal seq must win
    sinks.merge_into_partitioned(
        spark,
        spark.createDataFrame(
            [(2, "b-back", "n1")],
            "book_id long, name string, narrator_id string",
        ),
        target,
        key_col="book_id",
        partition_col="narrator_id",
    )
    live2 = sinks.read_merged_partitioned(
        spark, target, key_col="book_id", partition_col="narrator_id"
    )
    assert [
        (r.name, r.narrator_id)
        for r in live2.filter("book_id = 2").collect()
    ] == [("b-back", "n1")]

    # sidecar is invisible to plain table reads (underscore-prefixed dir)
    assert os.path.isdir(os.path.join(target, "_tombstones"))

    # journal=False restores the reference's immobile-key contract: no
    # sidecar growth
    import glob as _glob

    n_files = len(_glob.glob(os.path.join(target, "_tombstones", "*")))
    sinks.merge_into_partitioned(
        spark,
        spark.createDataFrame(
            [(3, "c2", "n2")], "book_id long, name string, narrator_id string"
        ),
        target,
        key_col="book_id",
        partition_col="narrator_id",
        journal=False,
    )
    assert len(_glob.glob(os.path.join(target, "_tombstones", "*"))) == n_files


def test_compact_partitioned_merge_folds_journal(spark, tmp_path):
    """Compaction rewrites only partitions holding dead rows, removes
    fully-dead partition directories, clears the sidecar, and afterwards a
    PLAIN read (no journal application) equals the live view."""
    target = str(tmp_path / "merge_compact")
    spark.createDataFrame(
        [(1, "a", "n1"), (2, "b", "n1"), (3, "c", "n2"), (4, "d", "n3")],
        "book_id long, name string, narrator_id string",
    ).write.partitionBy("narrator_id").parquet(target)

    # key 2 moves n1 -> n9; key 4 moves n3 -> n9 (n3 becomes fully dead)
    sinks.merge_into_partitioned(
        spark,
        spark.createDataFrame(
            [(2, "b2", "n9"), (4, "d2", "n9")],
            "book_id long, name string, narrator_id string",
        ),
        target,
        key_col="book_id",
        partition_col="narrator_id",
    )
    assert spark.read.parquet(target).count() == 6  # 2 stale rows on disk

    sinks.compact_partitioned_merge(
        spark, target, key_col="book_id", partition_col="narrator_id"
    )
    # sidecar gone, fully-dead partition dir gone
    assert not os.path.isdir(os.path.join(target, "_tombstones"))
    assert not os.path.isdir(os.path.join(target, "narrator_id=n3"))
    # plain read now equals the live view — no journal needed
    rows = {
        r.book_id: (r.name, r.narrator_id)
        for r in spark.read.parquet(target).collect()
    }
    assert rows == {
        1: ("a", "n1"),
        2: ("b2", "n9"),
        3: ("c", "n2"),
        4: ("d2", "n9"),
    }
    # idempotent when no journal exists
    sinks.compact_partitioned_merge(
        spark, target, key_col="book_id", partition_col="narrator_id"
    )
    assert spark.read.parquet(target).count() == 4


def test_merge_journal_survives_self_referential_updates(spark, tmp_path):
    """The normal upsert idiom derives `updates` by READING the target
    table; the journal batch must be materialized BEFORE the dynamic
    overwrite deletes the files that plan references (regression: the
    post-overwrite journal append re-executed the updates plan against
    deleted files and crashed, leaving data written but no journal)."""
    target = str(tmp_path / "merge_selfref")
    spark.createDataFrame(
        [(1, "a", "n1"), (2, "b", "n1")],
        "book_id long, name string, narrator_id string",
    ).write.partitionBy("narrator_id").parquet(target)

    updates = (
        spark.read.parquet(target)
        .filter("book_id = 2")
        .withColumn("name", F.lit("fixed"))
        .withColumn("narrator_id", F.lit("n9"))
    )
    sinks.merge_into_partitioned(
        spark, updates, target, key_col="book_id", partition_col="narrator_id"
    )
    live = sinks.read_merged_partitioned(
        spark, target, key_col="book_id", partition_col="narrator_id"
    )
    rows = {r.book_id: (r.name, r.narrator_id) for r in live.collect()}
    assert rows == {1: ("a", "n1"), 2: ("fixed", "n9")}


def test_jsonl_commit_writer_two_phase(spark, tmp_path):
    """Python DataSource writer: task outputs stage under _staging and
    become visible only at job commit; a failed job aborts with NO
    partial output visible."""
    import json

    from tts_data_pipeline_spark.sources import pyds

    pyds.register_all(spark)
    target = str(tmp_path / "jsonl_ok")
    os.makedirs(target)
    df = (
        spark.read.format("books_catalog")
        .option("n_books", "100")
        .load()
        .repartition(4)
    )
    df.write.format("jsonl_commit").option("path", target).mode(
        "append"
    ).save()
    files = sorted(glob.glob(os.path.join(target, "part-*.jsonl")))
    rows = [json.loads(ln) for f in files for ln in open(f)]
    assert len(files) == 4
    assert sorted(r["book_id"] for r in rows) == list(range(100))
    assert not os.path.exists(os.path.join(target, "_staging"))

    # abort path: a task that fails mid-iteration must leave nothing
    # visible (the tmp files never rename into place)
    target2 = str(tmp_path / "jsonl_fail")
    os.makedirs(target2)
    from pyspark.sql import functions as F2
    from pyspark.sql.types import LongType

    @F2.udf(LongType())
    def boom(i):
        if i == 77:
            raise RuntimeError("mid-write failure")
        return i

    bad = df.withColumn("book_id", boom("book_id"))
    import pytest as _pytest

    with _pytest.raises(Exception):
        bad.write.format("jsonl_commit").option("path", target2).mode(
            "append"
        ).save()
    assert glob.glob(os.path.join(target2, "part-*.jsonl")) == []


def test_merge_honors_scratch_dir_and_env(spark, tmp_path, monkeypatch):
    """The staging round-trip uses the scratch root the caller points at
    (arg beats env var beats tempdir), and cleans its subdirs afterwards —
    on a cluster this is how staging stays on the table's filesystem."""
    from tts_data_pipeline_spark import scratch

    argroot = str(tmp_path / "scratch_arg")
    d = scratch.scratch_mkdtemp("probe_", argroot)
    assert d.startswith(argroot)
    os.rmdir(d)
    envroot = str(tmp_path / "scratch_env")
    monkeypatch.setenv(scratch.ENV_VAR, envroot)
    d2 = scratch.scratch_mkdtemp("probe_")
    assert d2.startswith(envroot)
    monkeypatch.delenv(scratch.ENV_VAR)

    target = str(tmp_path / "merge_scratch")
    spark.createDataFrame(
        [(1, "a", "n1"), (2, "b", "n2")],
        "book_id long, name string, narrator_id string",
    ).write.partitionBy("narrator_id").parquet(target)
    sinks.merge_into_partitioned(
        spark,
        spark.createDataFrame(
            [(2, "b2", "n2"), (3, "c", "n1")],
            "book_id long, name string, narrator_id string",
        ),
        target,
        key_col="book_id",
        partition_col="narrator_id",
        scratch_dir=argroot,
    )
    rows = {
        r.book_id: (r.name, r.narrator_id)
        for r in spark.read.parquet(target).collect()
    }
    assert rows == {1: ("a", "n1"), 2: ("b2", "n2"), 3: ("c", "n1")}
    # staging subdirs were created under the arg root and cleaned up
    assert os.listdir(argroot) == []


def test_merge_auto_compacts_journal_past_threshold(spark, tmp_path):
    """Journal growth is bounded: merges append one batch each until the
    row threshold trips, then exactly one compaction folds the journal in
    (sidecar removed, plain read equals live view); merges below the
    threshold never compact."""
    target = str(tmp_path / "merge_autocompact")
    spark.createDataFrame(
        [(1, "a", "n1"), (2, "b", "n1"), (3, "c", "n2")],
        "book_id long, name string, narrator_id string",
    ).write.partitionBy("narrator_id").parquet(target)

    sidecar = os.path.join(target, "_tombstones")
    # four merges, one journaled key each; threshold 3 trips on the 4th
    for i, (key, part) in enumerate([(1, "n2"), (2, "n2"), (3, "n1"), (1, "n1")]):
        sinks.merge_into_partitioned(
            spark,
            spark.createDataFrame(
                [(key, f"v{i}", part)],
                "book_id long, name string, narrator_id string",
            ),
            target,
            key_col="book_id",
            partition_col="narrator_id",
            auto_compact_journal_rows=3,
        )
        if i < 3:
            assert os.path.isdir(sidecar), f"merge {i}: journal should accumulate"
        else:
            assert not os.path.isdir(sidecar), "threshold crossed: compacted"
    # post-compaction: plain read IS the live view, no stale rows
    rows = {
        r.book_id: (r.name, r.narrator_id)
        for r in spark.read.parquet(target).collect()
    }
    assert rows == {1: ("v3", "n1"), 2: ("v1", "n2"), 3: ("v2", "n1")}
