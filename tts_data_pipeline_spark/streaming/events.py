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

Deployment note (state backend): every stateful operator here runs
unchanged under ``spark.sql.streaming.stateStore.providerClass =
...state.RocksDBStateStoreProvider`` — the production provider once
per-shard state outgrows executor heap (the default HDFS-backed store
keeps the working map in memory).  Output equivalence is pinned by
``test_stateful_ops_identical_under_rocksdb_state_store``; the provider
is checkpoint-bound, so pick it before first start, like the shard
count (see :func:`_state_partitions`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _events_ts_unit(sf_dir: str) -> str:
    """Probe the events parquet footer for the physical ts unit ('ns'/'us').

    The driver's generator has shipped both TIMESTAMP(NANOS) and
    TIMESTAMP(MICROS) across rounds; a streaming source needs an imposed
    schema, so the right one must be chosen from the footer (the batch
    reader in ``sources/readers.py`` adapts the same way via dtypes)."""
    import os

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "events.parquet")
    if os.path.isdir(path):
        part = next(f for f in sorted(os.listdir(path)) if f.endswith(".parquet"))
        path = os.path.join(path, part)
    ts_type = pq.read_schema(path).field("ts").type
    return getattr(ts_type, "unit", "us")


def _state_partitions(spark: SparkSession) -> int:
    """Shuffle-partition count for the stateful replay streams.

    One shuffle partition = one state-store shard, and each shard pays a
    fixed open/commit/maintenance cost EVERY micro-batch regardless of how
    many keys it holds.  So shard count is sized to expected state volume,
    not core count: these finite replays carry ≤ ~100 k keys — a few MB —
    where even 2 shards are comfortably sized, and the per-batch commit
    cost is proportional to shard count (measured on the watermarked
    dedup replay: 8 shards 3.36 s, 4 → 3.11 s, 2 → 2.79 s, 1 → 2.86 s,
    output hash identical throughout — results never depend on shard
    count, only cost does).  (On a real cluster this is the one knob
    frozen into the checkpoint at first start — pick it for the target
    state size, then it cannot change without a state rebuild.)

    This sizing is for JVM-side stateful operators (windowed aggs,
    dropDuplicatesWithinWatermark) where per-shard work is trivial and
    the commit cost dominates.  PYTHON-side stateful operators
    (applyInPandasWithState) invert the trade — see
    :func:`_python_state_partitions`."""
    return min(2, spark.sparkContext.defaultParallelism)


def _python_state_partitions(spark: SparkSession) -> int:
    """Shard count for ``applyInPandasWithState`` replays.

    For a Python-side stateful operator each micro-batch pays one
    Arrow-batched Python invocation PER KEY, and shards are the only
    parallelism those invocations get — so unlike the JVM-side replays
    (where 2 shards minimize per-batch commit cost, see
    :func:`_state_partitions`), the per-key Python wall dominates and
    more shards win.  Measured on the timeout sessionizer's 5-batch
    sf0.1 replay (1,500 keys/batch, output identical at every width):
    2 shards 23-27 s, 4 → 15.6 s, 8 → 11.0 s, 16 → 10.2 s.  Re-measured
    round 14 after the emit-only-when-closed fix shifted the balance
    further toward per-key protocol cost (4-slice replay: 8 shards
    9.0 s, 16 → 7.3 s, 32 → 7.6 s): 16 is the new knee."""
    return min(16, spark.sparkContext.defaultParallelism)


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Streaming scan of the events directory (parquet file source).

    Schema must be imposed (streaming sources don't infer).  Nanos files
    need the nanos-as-long fallback + timestamp rebuild; micros files read
    natively as TimestampType.
    """
    from pyspark.sql import types as T

    nanos = _events_ts_unit(sf_dir) == "ns"
    if nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType() if nanos else T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    out = (
        spark.readStream.format("parquet")
        .schema(raw_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    if nanos:
        out = out.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return out


def windowed_counts(events: DataFrame, window: str = "10 minutes") -> DataFrame:
    """Tumbling-window counts with a watermark for late data — the SAME
    ``tumbling_counts`` builder the batch ``w4_tumbling_window`` query runs,
    so batch/streaming parity is structural, not copy-paste."""
    from tts_data_pipeline_spark.plans.windows import tumbling_counts

    return tumbling_counts(events.withWatermark("ts", "30 minutes"), window)


SESSION_OUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, total_value double"
)
# state rides as micros since epoch — primitive longs keep the state store
# compact and avoid timezone ambiguity inside the executor
SESSION_STATE_SCHEMA = (
    "session_start long, last_ts long, n_events long, total_value double"
)


def _fold_session_chunks(key_val, pdfs, ss, lt, n, tv, gap_seconds):
    """Fold one key's micro-batch rows into the open-session scalars.

    Rows can span multiple Arrow chunks, so sort ACROSS chunks, not
    per-chunk — a per-chunk sort would let an out-of-order timestamp
    regress session_end (and the registered timeout) or merge
    gap-separated sessions.  Equal-ts ties are always within-gap, so
    BOUNDARIES agree in any order — but ``total_value`` is a float fold,
    and float addition is order-dependent, so the tie order is pinned on
    ``event_id`` (r13 verdict #2): same rows → same fold order → same
    hash, independent of Arrow chunking and pandas sort stability.

    Returns ``(closed, ss, lt, n, tv)`` where ``closed`` is the list of
    gap-closed session tuples and the scalars are the still-open tail
    (``lt is None`` when no rows arrived and no state existed).
    """
    import numpy as np

    closed: list[tuple] = []
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        # pure-numpy assembly (r14): per-key pd.concat + sort_values cost
        # ~150-200 µs each — at ~15k keys/batch that WAS a visible slice
        # of the replay wall; np.concatenate + lexsort on the same tiny
        # arrays is single-digit µs, and tolist() hands the loop plain
        # ints/floats instead of boxing a pd.Timestamp per row
        t_parts = [
            c["ts"].to_numpy().astype("datetime64[us]").view("int64")
            for c in chunks
        ]
        e_parts = [c["event_id"].to_numpy() for c in chunks]
        v_parts = [c["value"].to_numpy() for c in chunks]
        t_us = t_parts[0] if len(chunks) == 1 else np.concatenate(t_parts)
        e_id = e_parts[0] if len(chunks) == 1 else np.concatenate(e_parts)
        vals = v_parts[0] if len(chunks) == 1 else np.concatenate(v_parts)
        order = np.lexsort((e_id, t_us))
        for t, v in zip(t_us[order].tolist(), vals[order].tolist()):
            if lt is None:
                ss = lt = t
                n, tv = 1, float(v)
            elif t - lt > gap_seconds * 1_000_000:
                closed.append((key_val, ss, lt, n, round(tv, 2)))
                ss = lt = t
                n, tv = 1, float(v)
            else:
                lt = t
                n += 1
                tv += float(v)
    return closed, ss, lt, n, tv


def _sessions_frame(closed: list[tuple]):
    """Columnar construction of a closed-sessions batch (dict-of-lists,
    not list-of-dicts): called only for keys that actually closed
    sessions this micro-batch — the common empty case yields NO frame,
    which r14 measured as the dominant per-key Python cost of the
    stateful replays (thousands of empty 5-column DataFrame builds)."""
    import pandas as pd

    u, s, e, c, t = zip(*closed)
    return pd.DataFrame(
        {
            "user_id": list(u),
            "session_start": pd.to_datetime(list(s), unit="us"),
            "session_end": pd.to_datetime(list(e), unit="us"),
            "n_events": list(c),
            "total_value": list(t),
        }
    )


def stateful_sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Custom stateful streaming operator: gap-based sessionization via
    ``applyInPandasWithState`` (the arbitrary-state API; same semantics as
    the batch ``w3_sessionize`` query's gap rule).

    Per user key, an open session lives in the state store as four scalars
    (bounded state: O(1) per user, not O(events)); each micro-batch folds
    its events in ts order, emits sessions that CLOSE (a gap > gap_seconds
    splits), and parks the still-open tail back in state.  At scale the
    state store shards by the grouping key across executors — this is the
    pattern for any custom incremental operator Spark lacks natively."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        if state.exists:
            ss, lt, n, tv = state.get
        else:
            ss = lt = None
            n, tv = 0, 0.0
        closed, ss, lt, n, tv = _fold_session_chunks(
            key[0], pdfs, ss, lt, n, tv, gap_seconds
        )
        if lt is not None:
            state.update((int(ss), int(lt), int(n), float(tv)))
        if closed:
            yield _sessions_frame(closed)
        # most keys close nothing in a given micro-batch — yielding no
        # frame at all skips a per-key pandas DataFrame construction
        # (measured: the dominant Python cost of the replay)

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        SESSION_OUT_SCHEMA,
        SESSION_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def run_stateful_sessions_to_memory(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "stateful_sessions",
    gap_seconds: int = 1800,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Drive the stateful sessionizer over the file stream to completion.
    Returns CLOSED sessions (each user's open tail stays in state — with an
    unbounded stream it would close via timeout or a later gap)."""
    # state store shards = shuffle partitions; Python-side stateful op →
    # shards are also the per-key-invocation parallelism (see
    # _python_state_partitions), restoring the caller's conf afterwards
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(_python_state_partitions(spark))
    )
    try:
        stream = read_events_stream(spark, sf_dir, max_files_per_trigger)
        out = stateful_sessionize(stream, gap_seconds)
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName(query_name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.sql(f"SELECT * FROM {query_name}")


def stateful_sessionize_timeout(
    events: DataFrame, gap_seconds: int = 1800
) -> DataFrame:
    """:func:`stateful_sessionize` plus the PRODUCTION state-retirement
    knob: ``GroupStateTimeout.EventTimeTimeout``.  Without a timeout an
    open session lives in the state store forever (the r12 state-growth
    decade measured removed=0 for the NoTimeout form — state equals ALL
    users ever seen); with it, a dormant user's parked session is
    emitted and the key REMOVED once the watermark passes
    ``last_ts + gap`` — state holds only users active inside the
    session-gap horizon.

    Timeout semantics, probe-measured on this Spark build (same method
    as the ``dropDuplicatesWithinWatermark`` policy replay at
    :func:`run_stream_dedup_watermarked`):

    * a timeout fires in the first batch whose watermark STRICTLY
      exceeds the registered timestamp (equality does not fire —
      probed with W == timeout exactly);
    * watermarks are millisecond-truncated (EventTimeStats accumulates
      event-time µs / 1000), so the firing rule in µs terms is
      ``floor(last_us/1000) + gap_ms < floor(max_us/1000) − delay_ms``
      with the final watermark ``floor(max_us/1000) − delay_ms``;
    * trailing no-data micro-batches carry the final watermark and fire
      the last timeouts (``noDataMicroBatches`` must stay ON, the
      opposite of the dedup replay's setting);
    * a timeout can never fire before a within-gap successor event is
      processed: with chronological slices, the watermark of the batch
      carrying successor t2 is < t2 − delay ≤ last + gap − delay,
      strictly below the registered timeout for any delay > 0 — so the
      EMITTED SESSION SET is independent of slicing and equals the
      batch gap-sessionization minus only the tails still inside the
      horizon (the oracle's closed-form).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        if state.exists:
            ss, lt, n, tv = state.get
        else:
            ss = lt = None
            n, tv = 0, 0.0
        closed: list[tuple] = []
        if state.hasTimedOut:
            # dormant key: emit the parked session, retire the state
            closed.append((key[0], ss, lt, n, round(tv, 2)))
            state.remove()
        else:
            folded, ss, lt, n, tv = _fold_session_chunks(
                key[0], pdfs, ss, lt, n, tv, gap_seconds
            )
            closed.extend(folded)
            if lt is not None:
                state.update((int(ss), int(lt), int(n), float(tv)))
                # ms epoch; fires when the watermark strictly passes it
                state.setTimeoutTimestamp(
                    lt // 1000 + gap_seconds * 1000
                )
        if closed:
            yield _sessions_frame(closed)
        # see stateful_sessionize: empty-handed keys yield nothing

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        SESSION_OUT_SCHEMA,
        SESSION_STATE_SCHEMA,
        "append",
        GroupStateTimeout.EventTimeTimeout,
    )


# (kind, sf_dir, extra) -> staged replay dir.  Each deterministic replay
# stages micro-batch files derived from the IMMUTABLE events table — the
# staged bytes are a pure function of (table, replay parameters), so
# re-invocations (bench min-of-N, the driver's sweep) reuse the files
# instead of re-paying the derivation + write (~0.5-1 s warm per replay
# at sf0.1).  Mirrors cachereg's replace-on-reinvoke idea at the file
# layer; validated by re-listing the expected file count.  Side benefit:
# one staging dir per replay per corpus instead of one per invocation
# (the per-call mkdtemp previously accumulated dirs over a session).
_REPLAY_STAGING: dict[tuple, str] = {}


def _staged_replay_cached(
    kind: str, sf_dir: str, n_files: int, build, extra_key: tuple = ()
) -> str:
    """Return a staging dir holding ``n_files`` ``events_*.parquet``
    replay files, building them with ``build(staging_dir)`` on first use
    per ``(kind, sf_dir, *extra_key)``."""
    import os

    from tts_data_pipeline_spark.scratch import scratch_mkdtemp

    key = (kind, os.path.abspath(sf_dir)) + extra_key
    cached = _REPLAY_STAGING.get(key)
    if cached is not None and os.path.isdir(cached):
        staged = [
            f
            for f in os.listdir(cached)
            if f.startswith("events_") and f.endswith(".parquet")
        ]
        if len(staged) == n_files:
            return cached
    staging = scratch_mkdtemp(f"{kind}_")
    # dirs live for the process (reuse is the point) but not past it —
    # the pre-cache code deleted per invocation; without this a long
    # session of driver/bench/test processes would each orphan a dir
    import atexit
    import shutil

    atexit.register(shutil.rmtree, staging, ignore_errors=True)
    build(staging)
    _REPLAY_STAGING[key] = staging
    return staging


def _replay_staging_cached(
    spark: SparkSession, sf_dir: str, n_slices: int
) -> str:
    from pyspark.sql import Window

    from tts_data_pipeline_spark.sources.readers import table

    def build(staging: str) -> None:
        ev = table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "value"
        )
        b = F.ntile(n_slices).over(Window.orderBy("ts", "event_id")) - 1
        _stage_replay_partitions(
            ev.withColumn("b", b), staging, "b", list(range(n_slices))
        )

    return _staged_replay_cached(
        "sessions_timeout_stream", sf_dir, n_slices, build, (n_slices,)
    )


def _wm_dedup_staging(spark: SparkSession, sf_dir: str) -> str:
    """Staged 4-batch replay files for the watermarked-dedup entry —
    factored out of :func:`run_stream_dedup_watermarked` so
    :func:`prestage_replays` can build them outside a bench's timed
    region (r14 verdict #1)."""
    import os

    def build(staging: str) -> None:
        if _events_ts_unit(sf_dir) == "ns":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
            raw = raw.withColumn("ts", F.expr("ts div 1000"))
        else:
            raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
            raw = raw.withColumn(
                "ts", F.unix_micros(F.col("ts").cast("timestamp"))
            )
        # key on (user, type, hour) so per-key representative times
        # SPREAD across the event range — with the bare (user, type)
        # key every per-key min lands at the start of the range and
        # the late-drop / absorb / re-emit sets go degenerate
        # (all-or-nothing).
        # Cached: the four staged batch files below are all filters of
        # this one aggregate — without the persist each write would
        # redo the raw scan + groupBy shuffle (4× the work for a
        # ≤100 k-row replay frame; measured part of the bench fixed
        # cost).
        keyed = (
            raw.groupBy(
                "user_id",
                "event_type",
                F.expr(
                    "unix_micros(date_trunc('hour', timestamp_micros(ts)))"
                ).alias("hr"),
            )
            .agg(F.min("ts").alias("ts"))
            .persist()
        )
        # T (the global max key time) is derived INSIDE the first
        # staged write via an Observation above the parity filter — no
        # separate agg(max).collect() scan (round-5 advice #6).
        from pyspark.sql import Observation

        obs = Observation()
        even = keyed.filter(F.col("user_id") % 2 == 0)
        odd = keyed.filter(F.col("user_id") % 2 == 1)
        _stage_replay_file(
            keyed.observe(obs, F.max("ts").alias("t_max")).filter(
                F.col("user_id") % 2 == 0
            ),
            staging,
            0,
        )
        t_max = obs.get["t_max"]
        probes = even.select(
            "user_id", "event_type", "hr", F.lit(t_max).alias("ts")
        )
        spacer = probes.orderBy("user_id", "event_type", "hr").limit(1)
        _stage_replay_partitions(
            spacer.withColumn("b", F.lit(1))
            .unionByName(odd.withColumn("b", F.lit(2)))
            .unionByName(probes.withColumn("b", F.lit(3))),
            staging,
            "b",
            [1, 2, 3],
        )
        keyed.unpersist()

    # staged batches are delay-independent (parity/probe splits of the
    # keyed frame), so the cache key is the corpus alone
    return _staged_replay_cached("wm_dedup_stream", sf_dir, 4, build)


def prestage_replays(spark: SparkSession, sf_dir: str) -> None:
    """Build every deterministic replay's staged micro-batch files for
    ``sf_dir`` — the setup a bench hoists OUT of its timed region and
    declares (r14 verdict #1).

    Timed-region policy for the streaming replay entries: the thing
    under test is the STREAMING QUERY — source discovery, watermark and
    state machinery, per-micro-batch commits — not the one-time
    derivation of the replay's input files from the immutable events
    table (in production that source simply exists; here it is staged
    from the batch table as a pure function of (corpus, replay
    parameters)).  The r14 memo made re-invocations skip staging, which
    meant pass 1 of a min-of-N bench paid it and later passes did not —
    a timed region that silently differed between passes.  Calling this
    before ANY timed pass makes every pass measure the same thing, for
    all three staged replays uniformly (timeout sessionizer, late-data
    policy, watermarked dedup; the other streaming entries read
    ``events.parquet`` directly and stage nothing)."""
    _replay_staging_cached(spark, sf_dir, n_slices=2)
    _late_replay_staging(spark, sf_dir)
    _wm_dedup_staging(spark, sf_dir)


def run_stateful_sessions_timeout_to_memory(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "stateful_sessions_timeout",
    gap_seconds: int = 1800,
    delay_seconds: int = 1800,
    n_slices: int = 2,
) -> DataFrame:
    """Drive the timeout sessionizer over a CHRONOLOGICAL multi-batch
    replay (events globally sorted by (ts, event_id), ntile'd into
    ``n_slices`` micro-batch files) so the watermark advances through
    the event-time range and event-time timeouts actually fire —
    a single-file replay would emit nothing but the gap-closed
    sessions.  Returns every emitted session: gap-closed + timeout-
    closed tails; only tails still inside the horizon
    (last_ts + gap ≥ final watermark) stay unemitted (and, unlike the
    NoTimeout form, they are ALSO the only keys still in state).

    ``n_slices`` is PHYSICAL: the emitted session set is slicing-
    independent (the docstring proof on :func:`stateful_sessionize_timeout`;
    measured round 14 — identical 95,345 rows at 2/3/4 slices, sf0.1).
    The default is the cheapest slicing that still exercises every
    semantic: 2 chronological batches fire mid-stream event-time
    timeouts in batch 2 and the final-watermark timeouts in the trailing
    no-data batches (4-slice replay 8.5 s warm vs 2-slice 4.8 s at
    sf0.1 — each extra batch re-pays the per-active-key Python protocol
    round).  Tests pin output equality across slicings
    (tests/test_sources_multimodal_streaming.py)."""
    from pyspark.sql import types as T

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    prev_nodata = spark.conf.get(
        "spark.sql.streaming.noDataMicroBatches.enabled", "true"
    )
    # Python-side stateful op: shards = per-key-invocation parallelism
    # (measured 2.2× on this replay — see _python_state_partitions)
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(_python_state_partitions(spark))
    )
    # trailing no-data batches carry the FINAL watermark that fires the
    # last timeouts — keep them ON (the dedup replay's opposite)
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    try:
        staging = _replay_staging_cached(spark, sf_dir, n_slices)
        schema = T.StructType(
            [
                T.StructField("event_id", T.LongType()),
                T.StructField("ts", T.TimestampType()),
                T.StructField("user_id", T.LongType()),
                T.StructField("value", T.DoubleType()),
            ]
        )
        stream = (
            spark.readStream.format("parquet")
            .schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .option("pathGlobFilter", "events_*.parquet")
            .load(staging)
        )
        out = stateful_sessionize_timeout(
            stream.withWatermark("ts", f"{delay_seconds} seconds"),
            gap_seconds,
        )
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName(query_name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", prev_nodata
        )
    return spark.sql(f"SELECT * FROM {query_name}")


def run_stream_to_memory(
    spark: SparkSession, sf_dir: str, query_name: str = "windowed_events"
) -> DataFrame:
    """Drive the stream to completion synchronously (local smoke/test path):
    memory sink + ``processAllAvailable`` + stop.  Returns the result table.

    Output mode 'complete' because the memory sink of a streaming agg with
    watermark in append mode only emits closed windows — for a finite file
    source nothing would close.
    """
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(_state_partitions(spark))
    )
    try:
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
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.sql(f"SELECT * FROM {query_name}")


def stream_merge_dedup(
    spark: SparkSession,
    sf_dir: str,
    target_path: str,
    key_col: str = "user_id",
) -> None:
    """Streaming upsert sink via foreachBatch: each micro-batch exact-dedups
    on the key and merges into the parquet target (J5's full-outer+coalesce
    upsert, applied incrementally).

    This is the arrival-time dedup pattern for continuous ingestion: the
    batch inside foreachBatch is a plain DataFrame, so the SAME merge logic
    (and the same oracle-checked semantics) serves batch backfill and the
    stream.  With a transactional table format (Delta/Iceberg) the
    read-modify-write becomes MERGE INTO; plain parquet needs the rewrite."""
    import os
    import shutil

    def merge(batch: DataFrame, batch_id: int) -> None:
        batch = batch.dropDuplicates([key_col])
        s = batch.sparkSession
        if any(f.startswith("part-") for f in (os.listdir(target_path) if os.path.isdir(target_path) else [])):
            current = s.read.parquet(target_path)
            keep = current.join(batch, key_col, "left_anti")
            merged = keep.unionByName(batch)
        else:
            merged = batch
        # plain-parquet rewrite: stage then swap (atomic enough for local
        # verification; table formats make this transactional)
        tmp = target_path + "__stage"
        merged.write.mode("overwrite").parquet(tmp)
        s.read.parquet(tmp).write.mode("overwrite").parquet(target_path)

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(_state_partitions(spark))
    )
    try:
        stream = read_events_stream(spark, sf_dir, max_files_per_trigger=1)
        q = (
            stream.writeStream.foreachBatch(merge)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        shutil.rmtree(target_path + "__stage", ignore_errors=True)


def run_stream_static_enrich(
    spark: SparkSession, sf_dir: str, query_name: str = "stream_enriched"
) -> DataFrame:
    """Stream-static join: the event stream enriched against a static
    dimension (each user's cohort day, computed batch-side), then aggregated
    per cohort.  The static side re-resolves per micro-batch, so a dimension
    update is picked up without restarting the stream — the standard pattern
    for slowly-changing enrichment at scale."""
    from pyspark.sql import functions as F

    from tts_data_pipeline_spark.sources.readers import table

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(_state_partitions(spark))
    )
    try:
        static_cohorts = (
            table(spark, sf_dir, "events")
            .groupBy("user_id")
            .agg(F.date_trunc("day", F.min("ts")).alias("cohort_day"))
        )
        stream = read_events_stream(spark, sf_dir)
        enriched = stream.join(static_cohorts, "user_id")
        agg = enriched.groupBy("cohort_day").agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
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
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.sql(f"SELECT * FROM {query_name}")


def run_sliding_stream_to_memory(
    spark: SparkSession, sf_dir: str, query_name: str = "sliding_events"
) -> DataFrame:
    """Sliding-window counts computed by the streaming runtime — same
    ``sliding_counts`` builder as the batch ``w5_sliding_window`` query
    (complete mode: finite file source, windows never close in append)."""
    from tts_data_pipeline_spark.plans.windows import sliding_counts

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(_state_partitions(spark))
    )
    try:
        events = read_events_stream(spark, sf_dir).withWatermark("ts", "30 minutes")
        agg = sliding_counts(events)
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
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.sql(f"SELECT * FROM {query_name}")


def run_session_window_stream(
    spark: SparkSession, sf_dir: str, query_name: str = "session_events"
) -> DataFrame:
    """Native ``session_window`` aggregation under the STREAMING runtime
    (merging-session state store).  Watermark delay 0s: after the final
    no-data micro-batch the watermark sits at max(ts), so every session
    whose end (last event + gap) ≤ max(ts) closes and emits in append
    mode.  The catalog oracle replays exactly that closure rule in SQL —
    the deterministic tail sessions (within one gap of the global max
    timestamp) stay open and are excluded on both sides."""
    from tts_data_pipeline_spark.plans.windows import session_window_counts

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(_state_partitions(spark))
    )
    try:
        events = read_events_stream(spark, sf_dir).withWatermark("ts", "0 seconds")
        agg = session_window_counts(events)
        q = (
            agg.writeStream.outputMode("append")
            .format("memory")
            .queryName(query_name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.sql(f"SELECT * FROM {query_name}")


def run_transform_with_state(
    spark: SparkSession, sf_dir: str, query_name: str = "tws_totals"
) -> DataFrame:
    """Per-user running totals via ``transformWithStateInPandas`` — the
    Spark 4 arbitrary-state API (typed ValueState in a RocksDB state
    store, timers available) that supersedes ``applyInPandasWithState``
    for custom incremental operators.

    State per user is two scalars (bounded, O(1) per key); each
    micro-batch folds its rows into the ValueState and emits the updated
    running totals, so with the finite one-file replay the final memory
    table equals the batch per-user aggregate — which is the catalog
    oracle.  The state store shards by the grouping key exactly like the
    sessionizer's; RocksDB keeps per-shard state off-heap and
    incrementally checkpointed at 100 TB key cardinalities."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", "n BIGINT, total DOUBLE")

        def handleInputRows(self, key, rows, timerValues):
            if self._agg.exists():
                n, total = self._agg.get()
            else:
                n, total = 0, 0.0
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._agg.update((n, total))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                }
            )

        def close(self) -> None:
            pass

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    prev_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    # Python StatefulProcessor: shards = per-key-invocation parallelism
    # (same trade as the sessionizers — see _python_state_partitions)
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(_python_state_partitions(spark))
    )
    # transformWithState requires the RocksDB state store provider
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = read_events_stream(spark, sf_dir)
        out = (
            stream.select("user_id", "value")
            .groupBy("user_id")
            .transformWithStateInPandas(
                RunningTotals(),
                "user_id BIGINT, n_events BIGINT, total_value DOUBLE",
                "Update",
                "None",
            )
        )
        q = (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName(query_name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        if prev_provider is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev_provider
            )
    return spark.sql(f"SELECT * FROM {query_name}")


def run_stream_stream_join(
    spark: SparkSession, sf_dir: str, query_name: str = "stream_joined"
) -> DataFrame:
    """STREAM-STREAM inner join with event-time range condition: each view
    joined to the same user's purchases within 30 minutes after it.

    Both sides carry watermarks so the join state is bounded: Spark derives
    the state-eviction bound from watermark + the time-range condition
    (views older than watermark − 30 min can never match a future purchase
    and are evicted).  This is THE pattern for correlating two event feeds
    at scale — state grows with the time window, not the stream length.
    Inner-join emission doesn't wait for the watermark, so with a
    deterministic finite replay the result equals the batch join, which is
    the catalog oracle."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(_state_partitions(spark))
    )
    try:
        base = read_events_stream(spark, sf_dir)
        views = (
            base.filter(F.col("event_type") == "view")
            .select(
                F.col("user_id").alias("v_user"),
                F.col("event_id").alias("view_id"),
                F.col("ts").alias("view_ts"),
            )
            .withWatermark("view_ts", "30 minutes")
        )
        purchases = (
            base.filter(F.col("event_type") == "purchase")
            .select(
                F.col("user_id").alias("p_user"),
                F.col("event_id").alias("purchase_id"),
                F.col("ts").alias("purchase_ts"),
            )
            .withWatermark("purchase_ts", "30 minutes")
        )
        joined = views.join(
            purchases,
            F.expr(
                """
                v_user = p_user
                AND purchase_ts >= view_ts
                AND purchase_ts <= view_ts + INTERVAL 30 MINUTES
                """
            ),
        ).select(
            F.col("v_user").alias("user_id"),
            "view_id",
            "purchase_id",
            "view_ts",
            "purchase_ts",
        )
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName(query_name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.sql(f"SELECT * FROM {query_name}")


def run_stream_stream_join_outer(
    spark: SparkSession, sf_dir: str, query_name: str = "stream_joined_outer"
) -> DataFrame:
    """STREAM-STREAM **left outer** join — :func:`run_stream_stream_join`
    plus the production question the inner form can't answer: which
    views never converted?

    Outer emission is watermark-DRIVEN, unlike inner: a view's
    null-extended row is emitted only when the global watermark proves
    no future purchase can match (state eviction), so the result depends
    on the final watermark.  With this finite replay the closed form is
    (probe-measured, same method as the timeout sessionizer's rule):

    * global watermark = min over BOTH sides (multipleWatermarkPolicy
      default) of ``floor_ms(max side ts) - 30 min delay``;
    * an unmatched view emits its null row iff
      ``view_ts_us <= (W_final_ms - 30 min window - 1 ms) * 1000`` —
      RAW microseconds against the ms state-value watermark, which
      carries Spark's safety ``- 1`` (StreamingJoinHelper's
      getStateValueWatermark); probed at ±0.1/±1 ms offsets: on-line
      and -0.1 ms views stay parked, -1 ms emits;
    * matched views emit their matched rows exactly as the inner join
      (chronological arrival means a match always lands before its
      view's eviction), never a null row;
    * unmatched views inside the final horizon stay parked in state and
      emit nothing — the oracle's closed form subtracts exactly those.

    ``noDataMicroBatches`` must stay ON: the trailing empty batch
    carries the final watermark that flushes the last evictions."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    prev_ndm = spark.conf.get(
        "spark.sql.streaming.noDataMicroBatches.enabled"
    )
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(_state_partitions(spark))
    )
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "true")
    try:
        base = read_events_stream(spark, sf_dir)
        views = (
            base.filter(F.col("event_type") == "view")
            .select(
                F.col("user_id").alias("v_user"),
                F.col("event_id").alias("view_id"),
                F.col("ts").alias("view_ts"),
            )
            .withWatermark("view_ts", "30 minutes")
        )
        purchases = (
            base.filter(F.col("event_type") == "purchase")
            .select(
                F.col("user_id").alias("p_user"),
                F.col("event_id").alias("purchase_id"),
                F.col("ts").alias("purchase_ts"),
            )
            .withWatermark("purchase_ts", "30 minutes")
        )
        joined = views.join(
            purchases,
            F.expr(
                """
                v_user = p_user
                AND purchase_ts >= view_ts
                AND purchase_ts <= view_ts + INTERVAL 30 MINUTES
                """
            ),
            "leftOuter",
        ).select(
            F.col("v_user").alias("user_id"),
            "view_id",
            "purchase_id",
            "view_ts",
            "purchase_ts",
        )
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName(query_name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", prev_ndm
        )
    return spark.sql(f"SELECT * FROM {query_name}")


def _stage_replay_file(part: DataFrame, staging: str, i: int) -> None:
    """Write one replay micro-batch as a single parquet file whose mtime
    fixes its position in the ``latestFirst=false`` replay order."""
    import os
    import shutil

    part_dir = os.path.join(staging, f"b{i}")
    part.coalesce(1).write.mode("overwrite").parquet(part_dir)
    pf = [f for f in os.listdir(part_dir) if f.startswith("part-")][0]
    dst = os.path.join(staging, f"events_{i}.parquet")
    shutil.move(os.path.join(part_dir, pf), dst)
    shutil.rmtree(part_dir)
    t = 1_000_000_000 + i * 100
    os.utime(dst, (t, t))


def _stage_replay_partitions(
    parts: DataFrame, staging: str, bcol: str, idx: list[int]
) -> None:
    """Write SEVERAL replay micro-batches in one partitioned job —
    ``repartition(bcol)`` puts each batch label wholly in one task, so
    every ``bcol=i`` directory holds exactly one part file, which is then
    moved/mtimed exactly like :func:`_stage_replay_file` would have.  One
    shuffle + one write action instead of one action per batch (the
    per-write job-scheduling fixed cost was the measured bulk of the
    watermarked-replay bench entry).  The partition column is dropped
    from the files by the partitioned write, so the staged schema is
    unchanged.  An empty batch (no directory) falls back to the
    single-file path to preserve the one-file-per-trigger contract."""
    import os
    import shutil

    tmp = os.path.join(staging, "_multi")
    parts.repartition(F.col(bcol)).write.partitionBy(bcol).mode(
        "overwrite"
    ).parquet(tmp)
    for i in idx:
        pdir = os.path.join(tmp, f"{bcol}={i}")
        dst = os.path.join(staging, f"events_{i}.parquet")
        if os.path.isdir(pdir):
            pf = [f for f in os.listdir(pdir) if f.startswith("part-")][0]
            shutil.move(os.path.join(pdir, pf), dst)
            t = 1_000_000_000 + i * 100
            os.utime(dst, (t, t))
        else:  # empty batch: stage a header-only file the old way
            _stage_replay_file(
                parts.filter(F.col(bcol) == i).drop(bcol), staging, i
            )
    shutil.rmtree(tmp, ignore_errors=True)


def _late_replay_staging(
    spark: SparkSession, sf_dir: str, delay: str = "30 minutes"
) -> str:
    """Staged 3-batch replay files for the late-data policy entry —
    factored out of :func:`run_late_data_stream` so
    :func:`prestage_replays` can build them outside a bench's timed
    region (r14 verdict #1)."""
    import os

    def build(staging: str) -> None:
        # Stage the replay files in a canonical long-micros ts column
        # so the staged stream has one imposed schema regardless of
        # whether the source parquet is TIMESTAMP(NANOS) or MICROS.
        if _events_ts_unit(sf_dir) == "ns":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
            raw = raw.withColumn("ts", F.expr("ts div 1000"))
        else:
            raw = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
            # micros parquet reads as TIMESTAMP_NTZ; session is pinned
            # UTC so the cast to TIMESTAMP is identity before
            # extracting micros
            raw = raw.withColumn(
                "ts", F.unix_micros(F.col("ts").cast("timestamp"))
            )
        # The replay cutoff (max event time − delay) is derived INSIDE
        # the first staged write via an Observation — the observe node
        # sits above the parity filter so it sees every row, and the
        # metric comes back as a side effect of the write job.  No
        # separate agg(max).collect() scan (round-5 advice #6).
        from pyspark.sql import Observation

        obs = Observation()
        even = F.col("user_id") % 2 == 0
        delay_us = 30 * 60 * 1_000_000  # matches the default delay
        _stage_replay_file(
            raw.observe(obs, F.max("ts").alias("max_us")).filter(even),
            staging,
            0,
        )
        cutoff = obs.get["max_us"] - delay_us
        _stage_replay_file(
            raw.filter(~even & (F.col("ts") > cutoff)), staging, 1
        )
        _stage_replay_file(
            raw.filter(~even & (F.col("ts") <= cutoff)), staging, 2
        )

    return _staged_replay_cached("late_stream", sf_dir, 3, build, (delay,))


def run_late_data_stream(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "late_events",
    delay: str = "30 minutes",
) -> DataFrame:
    """Watermark late-data policy, demonstrated with a DETERMINISTIC
    three-micro-batch replay and checked by a SQL oracle.

    Replay order (per-file micro-batches via mtime + maxFilesPerTrigger=1):

    1. even-user rows — establishes event-time stats over the full range;
    2. odd-user rows with ts > max(ts) − delay ("on time");
    3. odd-user rows with ts ≤ max(ts) − delay ("late").

    Spark's aggregation filter drops a batch's rows against the watermark
    REPORTED for the previous trigger (measured: ``numRowsDroppedByWatermark``
    fires in batch 3, not batch 2), so by batch 3 the watermark sits at
    W = max(ts) − delay and every late odd row whose 10-minute window ended
    at or before W is dropped; append mode then emits exactly the windows
    with end ≤ W.  Net observable semantics — identical windows treated
    differently purely by ARRIVAL order:

        output = tumbling agg over (even rows ∪ on-time odd rows)
                 restricted to windows with end ≤ W

    Both W and the parity/recency split are scalar-derivable from the input,
    so the catalog oracle replays the whole policy in DuckDB."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(_state_partitions(spark))
    )
    try:
        staging = _late_replay_staging(spark, sf_dir, delay)

        from pyspark.sql import types as T

        raw_schema = T.StructType(
            [
                T.StructField("event_id", T.LongType()),
                T.StructField("ts", T.LongType()),
                T.StructField("user_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("value", T.DoubleType()),
                T.StructField("props", T.StringType()),
            ]
        )
        from tts_data_pipeline_spark.plans.windows import tumbling_counts

        stream = (
            spark.readStream.format("parquet")
            .schema(raw_schema)
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .load(staging)
            .withColumn("ts", F.expr("timestamp_micros(ts)"))
            .withWatermark("ts", delay)
        )
        agg = tumbling_counts(stream)
        q = (
            agg.writeStream.outputMode("append")
            .format("memory")
            .queryName(query_name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return spark.sql(f"SELECT * FROM {query_name}")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        # staging is owned by the replay cache (reused next invocation)


def run_stream_dedup_to_memory(
    spark: SparkSession, sf_dir: str, query_name: str = "stream_dedup"
) -> DataFrame:
    """Streaming exact dedup: ``dropDuplicates`` over the event key columns
    in append mode — each key's FIRST arrival is emitted, later copies are
    absorbed by the dedup state store.  Projecting to the key columns first
    makes the emitted set deterministic (which physical row wins is not),
    so the result is oracle-checkable as ``SELECT DISTINCT``.

    100 TB shape: state is one entry per distinct key, partitioned by the
    key hash across the state store.  Without a watermark that state grows
    with key cardinality — the production variant bounds it with
    ``withWatermark("ts", ...)`` + ``dropDuplicatesWithinWatermark`` (exact
    within the lateness horizon, which is the published dedup contract for
    at-least-once sources); here the key space is finite so the unbounded
    form is the one whose output a batch oracle can hash."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(_state_partitions(spark))
    )
    try:
        keys = read_events_stream(spark, sf_dir).select("user_id", "event_type")
        q = (
            keys.dropDuplicates(["user_id", "event_type"])
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(query_name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.sql(f"SELECT * FROM {query_name}")


def run_stream_dedup_minhash(
    spark: SparkSession, sf_dir: str, query_name: str = "stream_dedup_mh"
) -> DataFrame:
    """Streaming NEAR-dup filter: each arriving document's 8-bin
    ONE-PERMUTATION MinHash signature (Li, Owen & Zhang 2012 — one md5
    per WORD, 3-gram shingle hashes combined arithmetically, bins by
    ``h % k``, min per bin; the engine-portable streaming sibling of
    ``dedup_minhash_lsh``) is computed MAP-SIDE
    inside the micro-batch, and ``dropDuplicates`` over the full
    signature emits only the FIRST document of every near-dup signature
    class — the streaming ingestion filter that keeps a crawl feed from
    re-admitting boilerplate that MinHash already collapses.

    Projecting to the signature columns makes the emitted SET
    deterministic (which physical document represents a class is not),
    so a batch DISTINCT-signature oracle can value-hash it — the same
    determinism argument as ``run_stream_dedup_to_memory``.

    100 TB shape: signature computation is stateless per-row expression
    work; state is ONE 64-byte entry per distinct signature class (far
    below per-document state — near-dup classes collapse), hash-partitioned
    across the state store; production bounds it with
    ``dropDuplicatesWithinWatermark`` exactly as the exact-dedup entry
    documents."""
    from pyspark.sql import types as T

    from tts_data_pipeline_spark.plans.extensions import _MH_SEEDS, _md5_long

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(_state_partitions(spark))
    )
    try:
        # the file source requires a DIRECTORY basePath; the test layout
        # keeps one parquet file per table in sf_dir, so glob-filter it
        docs = (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "documents.parquet")
            .parquet(sf_dir)
        )
        # Shingle hashing without shingle STRINGS: md5 each word ONCE,
        # then combine the three 60-bit word hashes arithmetically
        # (4a + 2b + c < 2^63, exact in both engines).  Three lessons
        # baked in, each measured on the sf0.1 replica: materialize the
        # split before any transform reads it (inline split re-parses per
        # element access — 30 s), skip array_distinct (min-per-bin over a
        # multiset equals min over the set, and distinct on string arrays
        # is quadratic), and never build per-shingle strings in an
        # interpreted higher-order function (~20 µs/shingle of pure
        # allocation; the long arithmetic form took the sf1 run
        # 285 s → ~30 s end to end)
        # the streaming file source does not split files — a single
        # parquet file is one task, serializing the CPU-dense hash work;
        # a stateless repartition spreads it across the cluster
        tokens = docs.select(
            F.split(F.lower(F.trim("text")), " ").alias("w")
        ).repartition(spark.sparkContext.defaultParallelism)
        word_hash = tokens.select(
            F.transform("w", lambda t: _md5_long(t)).alias("wh")
        ).filter(F.size("wh") >= 3)
        shingle = word_hash.select(
            F.transform(
                F.sequence(F.lit(1), F.size("wh") - 2),
                lambda i: F.element_at(F.col("wh"), i) * 4
                + F.element_at(F.col("wh"), i + 1) * 2
                + F.element_at(F.col("wh"), i + 2),
            ).alias("hs")
        )
        # one-permutation MinHash (Li, Owen & Zhang 2012): _MH_SEEDS bins
        # by h % k, min per bin — k× cheaper than a k-seed family (which
        # re-hashes every shingle per seed), with the empty-bin sentinel
        # standing in for densification (deterministic in both engines,
        # which is all a dedup EQUALITY key needs)
        def bin_min(j: int):
            # closure, not a default-arg lambda (the (element, index) trap
            # — see operators/dedup.py::minhash_signature)
            return F.coalesce(
                F.array_min(
                    F.filter("hs", lambda h: h % _MH_SEEDS == F.lit(j))
                ),
                F.lit(2**63 - 1),
            )

        sig_cols = [bin_min(j).alias(f"mh{j}") for j in range(_MH_SEEDS)]
        keys = shingle.select(*sig_cols)
        q = (
            keys.dropDuplicates([f"mh{j}" for j in range(_MH_SEEDS)])
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(query_name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.sql(f"SELECT * FROM {query_name}")


def run_stream_dedup_watermarked(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "stream_dedup_wm",
    delay: str = "30 minutes",
) -> DataFrame:
    """``dropDuplicatesWithinWatermark`` — the PRODUCTION bounded-state
    dedup this module's unbounded entries repeatedly point to — with a
    deterministic four-micro-batch replay that exercises every rule of
    its MEASURED semantics (probed on this Spark build, see below):

    1. late drop: a row whose event time is <= the watermark in effect
       (the one REPORTED for the previous trigger; epoch zero in batch
       0) is dropped before the state lookup;
    2. absorb: a surviving row whose key is PHYSICALLY in the state
       store is absorbed — membership is checked without consulting
       expiry, because eviction runs at the END of a batch (a duplicate
       arriving in the same batch its entry expires is still absorbed);
    3. no refresh: absorbed duplicates do NOT extend their entry's
       expiry (state keeps the FIRST emitted row's event time);
    4. evict + re-emit: an entry whose ``event_ts + delay`` falls below
       the watermark is removed at batch end, and a later re-send of
       that key is emitted as a fresh record — the documented
       at-least-once contract outside the lateness horizon.

    The watermark is DOUBLE-lagged for processing (batch i drops late
    rows against the watermark reported for batch i−1, which is computed
    from batch i−2's data) while state EVICTION at the end of batch i
    sees data through batch i−1 — both probe-measured.  Replay (per-key
    MIN-ts rows so each key appears once per file, making which-row-wins
    deterministic):

    - b0 = even-user keys: watermark epoch-0, all emit;
    - b1 = a SPACER — one probe of the deterministic first even key at
      the global max ts T: absorbed (rule 2), advances the data maximum;
    - b2 = odd-user keys, processed against W = max(b0 ts) − delay:
      emits exactly those with ts > W (rule 1, the late drop);
    - b3 = even-key probes at T, processed against W' = T − delay (from
      b1's spacer): state for keys with ts + delay < W' was evicted at
      the end of earlier batches, so exactly the keys with
      ts < T − 2·delay re-emit (rule 4); the rest are absorbed without
      refreshing state (rules 2-3).

    Every set above is a scalar-derivable function of the input, so the
    catalog oracle replays the full policy in DuckDB."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(_state_partitions(spark))
    )
    # no-data micro-batches only advance the watermark between data
    # batches; this replay's policy was re-measured with them OFF —
    # output hash identical (the lagged watermark each data batch sees
    # comes from the previous DATA batch's report either way) — and each
    # skipped empty batch saves a full state-store open/commit cycle
    prev_nodata = spark.conf.get(
        "spark.sql.streaming.noDataMicroBatches.enabled", "true"
    )
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    try:
        staging = _wm_dedup_staging(spark, sf_dir)

        from pyspark.sql import types as T

        schema = T.StructType(
            [
                T.StructField("user_id", T.LongType()),
                T.StructField("event_type", T.StringType()),
                T.StructField("hr", T.LongType()),
                T.StructField("ts", T.LongType()),
            ]
        )
        stream = (
            spark.readStream.format("parquet")
            .schema(schema)
            .option("maxFilesPerTrigger", 1)
            .option("latestFirst", "false")
            .load(staging)
            .withColumn("ts", F.expr("timestamp_micros(ts)"))
            .withColumn("hr", F.expr("timestamp_micros(hr)"))
            .withWatermark("ts", delay)
        )
        out = stream.dropDuplicatesWithinWatermark(
            ["user_id", "event_type", "hr"]
        )
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName(query_name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", prev_nodata
        )
        # staging is owned by the replay cache (reused next invocation)
    return spark.sql(f"SELECT * FROM {query_name}")


def run_stream_cms_to_memory(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "cms_cells",
    n_rows: int = 4,
    width: int = 256,
    window: str = "1 day",
) -> DataFrame:
    """Count-Min cells per tumbling window maintained BY THE STREAMING
    RUNTIME: each event explodes into its d portable-md5 (row, bucket)
    coordinates pre-watermark, and the windowed count aggregate IS the
    sketch — state per window is capped at d·w cells no matter how many
    distinct keys the stream carries, which is the whole reason to sketch
    a stream instead of counting it (a per-key windowed count's state
    grows with key cardinality; this one cannot).  Complete-mode memory
    sink for the finite replay, same contract as ``run_stream_to_memory``."""
    from tts_data_pipeline_spark.plans.extensions import _md5_long

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(_state_partitions(spark))
    )
    try:
        ev = read_events_stream(spark, sf_dir).select("ts", "user_id")
        rows = ev.select(
            "ts",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("j"),
                            F.pmod(
                                _md5_long(
                                    F.concat(
                                        F.lit(f"{j}:"),
                                        F.col("user_id").cast("string"),
                                    )
                                ),
                                F.lit(width),
                            ).alias("bucket"),
                        )
                        for j in range(n_rows)
                    ]
                )
            ).alias("h"),
        ).select("ts", "h.j", "h.bucket")
        agg = (
            rows.withWatermark("ts", "30 minutes")
            .groupBy(F.window("ts", window).alias("win"), "j", "bucket")
            .count()
            .select(
                F.col("win.start").alias("win_start"),
                "j",
                "bucket",
                F.col("count").alias("cell"),
            )
        )
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
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.sql(f"SELECT * FROM {query_name}")
