"""SparkSession factory tuned for the engine.

Local-mode defaults mirror the target cluster posture: AQE on (runtime
re-plan, skew-join splitting, partition coalescing), shuffle partitions
sized to cores rather than the 200 default, Arrow enabled for the Pandas-UDF
slow path, and UTC session timezone so timestamp results are comparable with
UTC-naive engines (parquet stores naive micros; DuckDB reads them naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "tts_data_pipeline_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession with scale-aware defaults."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(max(cpus, 4)))
        )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batch rows bound executor memory for UDFs over fat rows
        # (binary payloads, decoded waveforms/pixels); 10k default rows ×
        # multi-MB media = OOM at scale, 2048 keeps batches ~GB-safe
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.ui.enabled", "false")
        # Local mode: the driver JVM hosts all executor threads, so size the
        # heap for cores × per-task working set (32 threads on an 8g heap is
        # ~250 MB/task).  Do NOT add -XX:+AlwaysPreTouch here: pre-faulting
        # the whole heap commits 16 GB of real RAM up front on this
        # lazily-backed VM, and the resulting memory pressure degraded every
        # later query in a bench session by 5-30× (measured: the same
        # 6-query dedup sequence ran 156 s with pretouch, 58 s without;
        # ngram verify alone 100 s vs 3.7 s).
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def gateway_token() -> int:
    """Identity token of the live SparkContext backing Column construction.

    Memoized unresolved Columns (``vi_cardinal_named``, the JL projection
    templates) wrap Py4J JavaObject refs bound to the CURRENT JVM gateway;
    if the SparkContext is stopped and recreated in the same process a
    cached Column would silently hold a dead ref — or, because Py4J
    reuses object ids, resolve to a DIFFERENT JVM object.  Every Column
    memo keys on this token so a recreated context misses the cache and
    rebuilds (r14 ADVICE #1).  ``id()`` of the active context is enough:
    a stopped context cannot be reactivated, so a new gateway always
    means a new Python ``SparkContext`` object (held alive by the memo's
    key tuple? no — ints are copied, so we also keep the startTime to
    disambiguate id reuse after GC)."""
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    if sc is None:
        return 0
    return hash((id(sc), getattr(sc, "startTime", 0)))


def ensure_utc(spark: SparkSession) -> SparkSession:
    """Pin the session timezone to UTC (runtime-settable).

    Called by every catalog query that touches timestamps so results are
    identical regardless of which session the driver hands us.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark
