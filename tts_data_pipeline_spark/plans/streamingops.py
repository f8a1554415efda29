"""Structured Streaming catalog queries — the streams run to completion
locally (parquet file source → memory sink, ``processAllAvailable``) and
return their result tables, so the driver checks STREAMING results, not a
batch stand-in.

``stream_tumbling_counts`` carries the SAME DuckDB oracle as the batch
``w4_tumbling_window`` query: window()/watermark semantics are identical in
batch and streaming by design, and this query proves it with a value-hash
match.  The stateful sessionizer is rows-only (its state machine has no SQL
equivalent; parity with the batch gap rule is pinned in tests)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tts_data_pipeline_spark.plans.registry import query
from tts_data_pipeline_spark.session import ensure_utc
from tts_data_pipeline_spark.streaming.events import (
    run_stateful_sessions_to_memory,
    run_stream_to_memory,
)


from tts_data_pipeline_spark.plans.windows import W4_TUMBLING_ORACLE


@query("stream_tumbling_counts", oracle=W4_TUMBLING_ORACLE)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window counts computed BY THE STREAMING RUNTIME (file
    source, watermark, incremental state) — hash-equal to the batch oracle."""
    ensure_utc(spark)
    out = run_stream_to_memory(spark, sf_dir, "q_stream_tumbling")
    return out.orderBy("win_start", "event_type")


@query("stream_stateful_sessions")
def stream_stateful_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed gap-sessions from the applyInPandasWithState operator
    (rows-only; batch parity test in
    tests/test_sources_multimodal_streaming.py)."""
    ensure_utc(spark)
    out = run_stateful_sessions_to_memory(spark, sf_dir, "q_stream_sessions")
    return out.orderBy("user_id", "session_start")


@query(
    "stream_static_enrich",
    oracle="""
    WITH cohorts AS (
      SELECT user_id, CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP) AS cohort_day
      FROM events GROUP BY user_id
    )
    SELECT c.cohort_day,
           COUNT(*) AS n_events,
           ROUND(SUM(e.value), 2) AS total_value
    FROM events e JOIN cohorts c ON e.user_id = c.user_id
    GROUP BY c.cohort_day
    ORDER BY c.cohort_day
    """,
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join run by the streaming runtime, hash-checked
    against the equivalent batch join+aggregate oracle."""
    from tts_data_pipeline_spark.streaming.events import run_stream_static_enrich

    ensure_utc(spark)
    out = run_stream_static_enrich(spark, sf_dir, "q_stream_static")
    return out.orderBy("cohort_day")
