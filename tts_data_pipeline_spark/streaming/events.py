"""Structured Streaming surface (SURVEY.md §2.10).

The reference is batch-only; the driver's ``events`` table is the streaming
extension point.  The transformations here are the SAME builders the batch
catalog uses (``plans/windows.py``) — ``window()``/watermark semantics are
identical in batch and streaming, so batch runs (DuckDB-verifiable) certify
the streaming pipeline's results, and the streaming runtime only adds
incremental state management.

For local verification we drive a parquet-source stream to completion with
``processAllAvailable`` into a memory sink (no cluster, no Kafka — the
source/sink are swappable by config at deploy time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Streaming scan of the events directory (parquet file source).

    Schema must be imposed (streaming sources don't infer).  The driver's
    parquet stores TIMESTAMP(NANOS); the file-source reader needs the same
    nanos-as-long fallback as the batch path, then rebuilds the timestamp.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    from pyspark.sql import types as T

    raw_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType()),  # nanos-as-long
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    return (
        spark.readStream.format("parquet")
        .schema(raw_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
        .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    )


def windowed_counts(events: DataFrame, window: str = "10 minutes") -> DataFrame:
    """Tumbling-window counts with a watermark for late data — identical
    aggregation to the batch ``w4_tumbling_window`` query."""
    return (
        events.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("win.start").alias("win_start"), "event_type", "n", "total_value"
        )
    )


def run_stream_to_memory(
    spark: SparkSession, sf_dir: str, query_name: str = "windowed_events"
) -> DataFrame:
    """Drive the stream to completion synchronously (local smoke/test path):
    memory sink + ``processAllAvailable`` + stop.  Returns the result table.

    Output mode 'complete' because the memory sink of a streaming agg with
    watermark in append mode only emits closed windows — for a finite file
    source nothing would close.
    """
    agg = windowed_counts(read_events_stream(spark, sf_dir))
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
