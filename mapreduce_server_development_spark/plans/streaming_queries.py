"""Streaming query library over the ``events`` table.

The reference is strictly batch (SURVEY.md §2.3: heartbeats are
control-plane, not data-plane), so this module is additive surface:
Structured Streaming versions of the time-windowed aggregations, run
with ``trigger(availableNow=True)`` so the parquet fixture is consumed
as a bounded stream and the query function can return the final result
DataFrame to the driver.

Each streaming query's result equals its batch twin once the stream is
fully consumed, so the DuckDB oracles are exact — the driver checks
them at full strength rather than rows-only.

Scale posture: in production the same plans run against an unbounded
source (Kafka/files) with a watermark bounding state; here complete
output mode over a bounded fixture keeps results deterministic.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query

DEC = "decimal(16,4)"

#: Read schema for the raw events parquet: ``ts`` is INT64
#: TIMESTAMP(NANOS); asking for ``timestamp_ntz`` makes the parquet
#: reader truncate to microseconds deterministically (Spark 4.1+),
#: independent of the legacy nanosAsLong conf.
_EVENTS_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)

#: Spark 4.0 fallback schema: under ``nanosAsLong`` the NANOS column
#: surfaces as a raw nanosecond BIGINT (mirrors sources/tables.py).
_EVENTS_SCHEMA_40 = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)


def _nanos_native(spark: SparkSession) -> bool:
    """True when the parquet reader surfaces INT64 TIMESTAMP(NANOS) as
    ``timestamp_ntz`` natively (Spark 4.1+); 4.0 needs the legacy
    nanosAsLong long read. A streaming source must declare its schema
    up front, so unlike ``load_table`` (which sniffs the batch dtype)
    this gates on the runtime version."""
    major, minor = (int(x) for x in spark.version.split(".")[:2])
    return (major, minor) >= (4, 1)


def _stream_reader(spark: SparkSession, schema):
    """readStream builder shared by both timestamp paths: the glob
    matches ``events*.parquet`` so a test fixture can split arrival
    into several files (events-00.parquet, events-01.parquet, ...) and
    SPARK_GRAFT_STREAM_MAX_FILES_PER_TRIGGER (unset in production)
    bounds files per micro-batch — together these let the
    multi-micro-batch replay tests drive the REGISTERED queries with
    state crossing real batch boundaries (round-7 verdict ask #4)
    without a second implementation of any operator."""
    # recursiveFileLookup lets a replay fixture nest its arrival files
    # inside an events.parquet/ directory (the split_docs_dir layout:
    # the batch reader sees one dataset while the stream sees N
    # arrival units); flat driver fixtures are unaffected.
    r = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events*.parquet")
        .option("recursiveFileLookup", "true")
    )
    mft = os.environ.get("SPARK_GRAFT_STREAM_MAX_FILES_PER_TRIGGER")
    if mft:
        r = r.option("maxFilesPerTrigger", mft)
    return r


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` over the events parquet, ``ts`` normalized to a
    session-zone timestamp (UTC pinned, so wall-clock preserving).

    ``pathGlobFilter`` scopes the directory listing to the events
    file(s); on a real deployment this would be a growing directory or
    Kafka topic and nothing downstream changes. Both Spark 4.1 (native
    timestamp_ntz NANOS read) and 4.0 (legacy nanosAsLong bigint) paths
    are supported, matching ``sources/tables.py load_table``.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if _nanos_native(spark):
        raw = _stream_reader(spark, _EVENTS_SCHEMA).parquet(sf_dir)
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = _stream_reader(spark, _EVENTS_SCHEMA_40).parquet(sf_dir)
    # Integer division: ns values (~1.7e18) exceed double's exact
    # integer range, so a float path would corrupt microseconds.
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


#: One-outstanding sink GC: every streaming run leaves behind either a
#: driver-resident memory-sink table or an on-disk parquet/checkpoint
#: tmpdir that the RETURNED DataFrame still references — so they cannot
#: be dropped at return time, but a long-lived session (daemon, bench,
#: the 180-query oracle sweep) would otherwise accumulate them without
#: bound. Each new run releases the PREVIOUS run's sinks: callers
#: consume a streaming query's result before invoking the next one
#: (sequential harnesses), so at most one generation stays live.
_prev_memory_sinks: list[str] = []
_prev_sink_roots: list[str] = []


def _gc_previous_sinks(spark: SparkSession) -> None:
    while _prev_memory_sinks:
        name = _prev_memory_sinks.pop()
        try:
            spark.catalog.dropTempView(name)
        except Exception:  # noqa: BLE001 - best-effort GC
            pass
    while _prev_sink_roots:
        shutil.rmtree(_prev_sink_roots.pop(), ignore_errors=True)


@contextmanager
def _stream_partitions(spark: SparkSession, state_partitions: int | None = None):
    """Pin ``spark.sql.shuffle.partitions`` (= streaming state-partition
    count, fixed at first checkpoint) for the duration of a streaming
    run, restoring the batch setting afterwards.

    Every stateful micro-batch pays a fixed commit cost PER state-store
    instance, so the state partition count is a first-order knob: A/B at
    sf0.1/local[32] (round 5), q_stream_stream_join went 9.35s @ 32
    partitions -> 3.37s @ 8, with q_stream_user_state/q_stream_dedup
    seeing the same ~2x. Default 8 locally; on a cluster raise
    SPARK_GRAFT_STREAM_STATE_PARTITIONS so per-partition state fits one
    executor (state partitioning is by key hash, so correctness is
    unaffected — this is purely a parallelism/overhead tradeoff).

    ``state_partitions`` overrides the default for operators whose cost
    profile INVERTS the 8-partition tradeoff: an
    ``applyInPandasWithState`` op pays per-GROUP Python overhead (tens
    of thousands of Arrow round-trips), which scales down with cores,
    not with state-store commits — q_stream_minhash_dedup measured
    14.1s @ 8 -> 9.2s @ 32 warm at sf0.1 (BENCH_AB.json). The env var
    still wins when set (cluster operators know their state layout).
    """
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    default = str(state_partitions) if state_partitions else "8"
    spark.conf.set(
        key, os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTITIONS", default)
    )
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def _run_to_memory(df: DataFrame, spark: SparkSession, mode: str = "complete") -> DataFrame:
    """Run a bounded stream to completion into an in-memory table.

    Only for small aggregate outputs (thousands of rows) — the memory
    sink materializes on the driver. Large row sets go through
    ``_run_to_files``.
    """
    _gc_previous_sinks(spark)
    name = f"stream_sink_{uuid.uuid4().hex[:12]}"
    _prev_memory_sinks.append(name)
    with _stream_partitions(spark):
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)


def _run_to_files(
    df: DataFrame,
    spark: SparkSession,
    on_start=None,
    state_partitions: int | None = None,
) -> DataFrame:
    """Run a bounded append-mode stream to a parquet file sink and read
    it back — executors write part-files directly; the driver never
    holds the row set, so output size is unbounded (the production path
    for large streaming outputs at 100 TB). ``on_start`` (if given)
    receives the StreamingQuery right after start — observability
    callers use it to capture the runId."""
    _gc_previous_sinks(spark)
    root = tempfile.mkdtemp(prefix="stream_file_sink_")
    _prev_sink_roots.append(root)
    out, ckpt = f"{root}/out", f"{root}/ckpt"
    with _stream_partitions(spark, state_partitions):
        q = (
            df.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        if on_start is not None:
            on_start(q)
        q.awaitTermination()
    result = spark.read.parquet(out)
    # Checkpoint state is not needed once the bounded run is complete.
    shutil.rmtree(ckpt, ignore_errors=True)
    return result


_HOURLY_ORACLE = """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(16,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
"""


@query("q_stream_hourly_tumbling", oracle=_HOURLY_ORACLE)
def q_stream_hourly_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation as a real streaming query.

    Same result set as the batch ``q_events_hourly`` — windows are
    epoch-aligned and the fixture is fully consumed by availableNow.
    """
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    return _run_to_memory(agg, spark)  # no trailing sort: time-linear output


@query(
    "q_stream_sliding_counts",
    oracle="""
    WITH e AS (
        SELECT epoch_us(ts) AS us, event_type, value FROM events
    ),
    w AS (
        SELECT unnest([us - (us % 1800000000),
                       us - (us % 1800000000) - 1800000000]) AS wstart,
               event_type, value
        FROM e
    )
    SELECT strftime(make_timestamp(wstart), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(16,4))) AS DOUBLE) AS total_value
    FROM w
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q_stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 h window / 30 min slide) streaming aggregation.

    Oracle note: every event belongs to exactly two windows whose
    starts are ``floor30(ts)`` and ``floor30(ts) - 30min`` — the oracle
    materializes both per event and aggregates.
    """
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    return _run_to_memory(agg, spark)  # no trailing sort: time-linear output


#: Shared 30-minute-gap session-id assignment (LAG gap flag + cumsum),
#: interpolated by every oracle that needs the session relation
#: (q_session_window here, q_concurrent_sessions in relational_ext) —
#: ONE definition, so a gap-rule or tiebreak change cannot silently
#: diverge between queries. Yields ``numbered(user_id, ts, session_id)``.
SESSION_ID_CTES = """flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN epoch_us(ts)
                         - LAG(epoch_us(ts))
                             OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         >= 1800000000
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    numbered AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_id
        FROM flagged
    )"""


@query(
    "q_session_window",
    oracle=f"""
    WITH {SESSION_ID_CTES}
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` (30-minute gap) aggregation.

    Batch-mode session_window: one shuffle on user_id, sessions merged
    by the engine; window end = last event + gap, which the oracle
    reproduces with the lag/flag/cumsum construction. Session windows
    are half-open: an event arriving exactly at last_event + gap starts
    a NEW session, so the oracle splits on gap >= 30 min (compared at
    microsecond precision on both sides).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.col("w.end"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
        )
        # No trailing global sort — output is session-linear.
    )


@query(
    "q_stream_user_state",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_event,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS last_event
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q_stream_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator via ``applyInPandasWithState``:
    per-user running event count + first/last event time, state carried
    across batches as (count, min_ns, max_ns).

    This is the arbitrary-stateful-logic escape hatch the built-in
    windowed aggregations can't express (SURVEY §2.3 "Streaming" —
    purely additive surface). State is partitioned by user_id (one
    shuffle); timestamps are tracked as int64 nanoseconds so state
    comparison is exact. The operator emits its per-key running state
    each batch in APPEND mode through the parquet file sink
    (``_run_to_files``) — executors write part-files directly and the
    driver never holds a per-user row set (at 100 TB user cardinality
    a driver-side memory sink would OOM). The trailing max/min
    aggregate collapses multi-batch rows to the latest (cumulative)
    state, which equals the batch aggregate the oracle checks.
    """
    import pandas as pd

    def track(key, pdfs, state):
        (user_id,) = key
        n, mn, mx = state.get if state.exists else (0, None, None)
        for pdf in pdfs:
            ns = pdf["ts"].astype("int64")
            n += len(pdf)
            bmn, bmx = int(ns.min()), int(ns.max())
            mn = bmn if mn is None or bmn < mn else mn
            mx = bmx if mx is None or bmx > mx else mx
        state.update((n, mn, mx))
        fmt = lambda v: pd.Timestamp(v).strftime("%Y-%m-%d %H:%M:%S")  # noqa: E731
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "first_event": [fmt(mn)],
                "last_event": [fmt(mx)],
            }
        )

    ev = read_events_stream(spark, sf_dir)
    tracked = (
        ev.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            track,
            outputStructType="user_id long, n_events long, "
            "first_event string, last_event string",
            stateStructType="n long, mn long, mx long",
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )
    out = _run_to_files(tracked, spark)
    return out.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.min("first_event").alias("first_event"),
        F.max("last_event").alias("last_event"),
    )


@query(
    "q_stream_dedup",
    oracle="""
    SELECT event_id, MIN(event_type) AS event_type
    FROM events
    GROUP BY event_id
    ORDER BY event_id
    """,
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming dedup on event_id within a 1-hour watermark.

    event_id is unique in the fixture, so the watermark-state dedup is
    exactly reproduced by the keep-one-per-key oracle (MIN(event_type)
    GROUP BY event_id). Note the oracle equivalence needs that
    uniqueness: dropDuplicatesWithinWatermark keeps the FIRST-ARRIVED
    row per key, so same-id rows with DIFFERENT payloads would make
    the stream's survivor arrival-order-dependent while the oracle
    picks the MIN — full-row-identical duplicates are the only kind
    both sides collapse identically. Output goes
    through the parquet file sink (``_run_to_files``): the deduplicated
    row set grows linearly with the data, so the driver must never
    materialize it.
    """
    ev = read_events_stream(spark, sf_dir)
    deduped = (
        ev.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
        .select("event_id", "event_type")
    )
    return _run_to_files(deduped, spark)  # no trailing sort: event-linear output


@query(
    "q_stream_enrich",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           c_mktsegment,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(16,4))) AS DOUBLE) AS total_value
    FROM events
    JOIN customer ON c_custkey = user_id
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def q_stream_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join: enrich the event stream with a dimension.

    The static customer side is joined to every micro-batch (broadcast
    while it fits; AQE decides), then a tumbling-window aggregation by
    market segment — the canonical streaming-enrichment shape. The
    static side is re-read per batch, so dimension updates between
    batches are picked up for free at scale.
    """
    ev = read_events_stream(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    agg = (
        ev.join(cust, ev.user_id == cust.c_custkey)
        .groupBy(F.window("ts", "1 hour").alias("w"), "c_mktsegment")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "c_mktsegment",
            "n_events",
            "total_value",
        )
    )
    return _run_to_memory(agg, spark)  # no trailing sort: time-linear output


@query(
    "q_stream_stream_join",
    oracle="""
    SELECT c.event_id AS click_id, p.event_id AS purchase_id
    FROM events c
    JOIN events p ON p.user_id = c.user_id
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
      AND epoch_us(p.ts) >  epoch_us(c.ts)
      AND epoch_us(p.ts) <= epoch_us(c.ts) + 21600000000
    """,
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join: purchases within 6 h after a click.

    Both sides are watermarked and the join condition carries the
    event-time range, so the state store can evict a click once no
    in-range purchase can still arrive (and vice versa) — bounded state
    on an unbounded stream, the production-correct form. Results flow
    through the parquet file sink; the driver never materializes them.
    """
    clicks = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 6 HOURS")),
    ).select("click_id", "purchase_id")
    return _run_to_files(joined, spark)  # no trailing sort: pair-linear output


@query(
    "q_stream_mv",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(16,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q_stream_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming materialized-view maintenance via ``foreachBatch``:
    each micro-batch's PARTIAL aggregate (count + decimal sum per
    event_type — mergeable states) merges into a versioned parquet
    state table, so the standing rollup is updated with per-batch
    input cost and the final state equals the full batch aggregate
    (the oracle). This is the streaming twin of q_mv_incremental and
    the production shape for continuously-maintained warehouse
    rollups: the state table is one row per group, versioned by batch
    id. A replayed batch (sink write committed, checkpoint commit
    lost) re-merges from the latest version STRICTLY BELOW its own
    batch id — discovered from the filesystem, not driver memory — so
    it deterministically overwrites its own version instead of
    double-counting or reading the path it is writing.
    """
    _gc_previous_sinks(spark)
    root = tempfile.mkdtemp(prefix="stream_mv_")
    _prev_sink_roots.append(root)

    def _versions() -> list[int]:
        return sorted(
            int(name[1:])
            for name in os.listdir(root)
            if name.startswith("v") and name[1:].isdigit()
        )

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        partial = batch_df.groupBy("event_type").agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(DEC)).alias("sum_dec"),
        )
        prev_ids = [v for v in _versions() if v < batch_id]
        if prev_ids:
            prev = batch_df.sparkSession.read.parquet(f"{root}/v{prev_ids[-1]}")
            # No narrowing cast: batch 0 writes sum_dec as the widened
            # sum type (decimal(26,4)); casting the running total back
            # to decimal(16,4) would overflow once the cumulative sum
            # passes ~10^12 — exactly the regime the MV is for.
            partial = prev.unionByName(partial).groupBy("event_type").agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_dec").cast("decimal(26,4)").alias("sum_dec"),
            )
        partial.write.mode("overwrite").parquet(f"{root}/v{batch_id}")

    ev = read_events_stream(spark, sf_dir)
    with _stream_partitions(spark):
        q = (
            ev.writeStream.foreachBatch(merge)
            .option("checkpointLocation", f"{root}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    final = spark.read.parquet(f"{root}/v{_versions()[-1]}")
    return final.select(
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("sum_dec").cast("double").alias("total_value"),
    ).orderBy("event_type")


#: Stable schema of the streaming metrics query (values are runtime
#: measurements — the driver's check is rows-only, like the other
#: non-SQL-expressible ops).
_METRICS_SCHEMA = (
    "batch_id long, num_input_rows long, trigger_duration_ms long, "
    "state_rows_total long, state_rows_updated long, watermark string"
)


@query("q_stream_metrics")  # driver-side observability: no SQL oracle
def q_stream_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming observability via ``StreamingQueryListener``: one row
    per micro-batch with input rows, trigger duration, state-store row
    counts, and the event-time watermark.

    This is the data-plane twin of the reference's operational
    ``status`` verb (bin/mapreduce:63-74 reports process liveness; a
    100 TB streaming operator instead reads per-batch progress:
    throughput, state growth, watermark lag — exactly what this
    emits). The listener collects ``QueryProgressEvent``s from a
    watermarked stateful aggregation run end-to-end; progress
    delivery is asynchronous on the listener bus, so the collector
    polls until the terminated query's events have drained. Metrics
    VALUES are runtime-dependent (durations, rows/sec), so the
    correctness bar is the stable schema + non-empty progress rows —
    asserted in tests — not a value oracle. Likewise no multi-batch
    invariance test: the output is one row PER MICRO-BATCH, so its
    row set depends on arrival framing BY DESIGN (every other
    streaming query has a batch-boundary-invariance test).
    """
    import time as _time

    from pyspark.sql.streaming.listener import StreamingQueryListener

    progresses: list = []

    class _Collect(StreamingQueryListener):
        def onQueryStarted(self, event):  # noqa: N802 (Spark API names)
            pass

        def onQueryProgress(self, event):  # noqa: N802
            progresses.append(event.progress)

        def onQueryIdle(self, event):  # noqa: N802
            pass

        def onQueryTerminated(self, event):  # noqa: N802
            pass

    listener = _Collect()
    spark.streams.addListener(listener)
    try:
        ev = read_events_stream(spark, sf_dir)
        agg = (
            ev.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"))
        )
        # Append mode + file sink: watermark-driven finalization, so the
        # progress events carry real state-operator and watermark fields.
        run_ids: set[str] = set()
        _run_to_files(agg, spark, on_start=lambda q: run_ids.add(str(q.runId)))
        # Listener bus is async: wait for at least one progress event
        # (bounded; availableNow runs emit within the run's lifetime).
        deadline = _time.time() + 30
        while (
            not any(str(p.runId) in run_ids for p in progresses)
            and _time.time() < deadline
        ):
            _time.sleep(0.1)
    finally:
        spark.streams.removeListener(listener)

    # The listener bus is SHARED: a long-lived session (daemon, bench,
    # oracle sweep) may still be draining progress events from a prior
    # streaming query when this one registers — keep only THIS run's.
    progresses = [p for p in progresses if str(p.runId) in run_ids]
    rows = []
    for p in progresses:
        state = p.stateOperators[0] if p.stateOperators else None
        rows.append(
            (
                int(p.batchId),
                int(p.numInputRows),
                int((p.durationMs or {}).get("triggerExecution", 0)),
                int(state.numRowsTotal) if state else 0,
                int(state.numRowsUpdated) if state else 0,
                (p.eventTime or {}).get("watermark"),
            )
        )
    return spark.createDataFrame(rows, schema=_METRICS_SCHEMA)


@query(
    "q_stream_session_window",
    oracle=f"""
    WITH {SESSION_ID_CTES}
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
           COUNT(*) AS n_events
    FROM numbered
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
)
def q_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows as a REAL streaming aggregation (the streaming
    twin of the batch q_session_window, same oracle): 30-minute-gap
    ``session_window`` over the event stream, complete output mode so
    the bounded availableNow run emits every session including the
    trailing ones a watermarked append run would hold back. On an
    unbounded production stream the same plan runs with a watermark in
    append mode, emitting each session once the watermark passes its
    close — state per open session, merged by the engine on arrival.
    """
    ev = read_events_stream(spark, sf_dir)
    agg = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format(F.col("w.end"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_end"
            ),
            "n_events",
        )
    )
    return _run_to_memory(agg, spark)  # no trailing sort: session-linear


def _stream_cms_oracle() -> str:
    # Geometry imported from the batch sketch so the "streaming twin of
    # the batch CMS" claim survives a resize of _CMS_D/_CMS_W.
    from .sketches import _CMS_D, _CMS_W, _hexval_sql

    cell = (
        _hexval_sql("md5(CAST(r.r AS VARCHAR) || ':' || CAST(user_id AS VARCHAR))", 8)
        + f" % {_CMS_W}"
    )
    probe_cell = (
        _hexval_sql(
            "md5(CAST(h.r AS VARCHAR) || ':' || CAST(p.user_id AS VARCHAR))", 8
        )
        + f" % {_CMS_W}"
    )
    return f"""
    WITH cells AS (
        SELECT r.r AS r, {cell} AS col, COUNT(*) AS cnt
        FROM events CROSS JOIN (SELECT unnest(range({_CMS_D})) AS r) r
        GROUP BY 1, 2
    ),
    exact AS (
        SELECT user_id, COUNT(*) AS exact_cnt FROM events GROUP BY user_id
    ),
    probe AS (
        SELECT user_id, exact_cnt,
               row_number() OVER (ORDER BY exact_cnt DESC, user_id) AS rk
        FROM exact QUALIFY rk <= 20
    ),
    est AS (
        SELECT p.user_id, p.exact_cnt, MIN(c.cnt) AS cms_est
        FROM probe p
        CROSS JOIN (SELECT unnest(range({_CMS_D})) AS r) h
        JOIN cells c ON c.r = h.r AND c.col = {probe_cell}
        GROUP BY p.user_id, p.exact_cnt
    )
    SELECT user_id, CAST(exact_cnt AS BIGINT) AS exact_cnt,
           CAST(cms_est AS BIGINT) AS cms_est,
           CAST(cms_est - exact_cnt AS BIGINT) AS overcount
    FROM est
    ORDER BY exact_cnt DESC, user_id
    """


@query("q_stream_cms_users", oracle=_stream_cms_oracle())
def q_stream_cms_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch maintained BY the stream: each micro-batch's
    (row, cell) partial counts merge into the running sketch with SUM —
    the mergeability that makes sketches the streaming answer at 100 TB
    (state is <= 2048 counters regardless of stream length, vs a
    per-key running count whose state grows with the key domain).
    Complete-mode output is the final cell table; it equals the batch
    sketch exactly because SUM is associative and batch-order-free, so
    the DuckDB oracle verifies the whole streaming path value-exact.
    The probe (exact top-20 users, the verification branch) runs on the
    batch side against the streamed sketch.
    """
    from .sketches import _CMS_D, _CMS_W, _hexval_col

    def cms_col(r, key):
        return (
            _hexval_col(
                F.md5(F.concat(r.cast("string"), F.lit(":"), key.cast("string"))), 8
            )
            % _CMS_W
        )

    rows = F.array(*[F.lit(i) for i in range(_CMS_D)])
    stream = read_events_stream(spark, sf_dir)
    cells_stream = (
        stream.select(F.col("user_id"), F.explode(rows).alias("r"))
        .select("r", cms_col(F.col("r"), F.col("user_id")).alias("col"))
        .groupBy("r", "col")
        .agg(F.count("*").alias("cnt"))
    )
    cells = _run_to_memory(cells_stream, spark, mode="complete")

    ev = load_table(spark, sf_dir, "events")
    probe = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), "user_id")
        .limit(20)
        .select("user_id", "exact_cnt", F.explode(rows).alias("r"))
        .select(
            "user_id",
            "exact_cnt",
            "r",
            cms_col(F.col("r"), F.col("user_id")).alias("col"),
        )
    )
    est = (
        probe.join(F.broadcast(cells), ["r", "col"])
        .groupBy("user_id", "exact_cnt")
        .agg(F.min("cnt").alias("cms_est"))
    )
    return est.select(
        "user_id",
        F.col("exact_cnt").cast("long").alias("exact_cnt"),
        F.col("cms_est").cast("long").alias("cms_est"),
        (F.col("cms_est") - F.col("exact_cnt")).cast("long").alias("overcount"),
    ).orderBy(F.col("exact_cnt").desc(), "user_id")


def _stream_hll_oracle() -> str:
    # Geometry imported from the batch sketch (q_hll_vocab family) so a
    # register-count resize there cannot silently fork this twin.
    from .sketches import _HLL_M, _HLL_WBITS, _hexval_sql

    h48 = _hexval_sql("md5('hll:' || CAST(user_id AS VARCHAR))", 12)
    return f"""
    WITH hashed AS (
        SELECT event_type, {h48} AS h48 FROM events
    ),
    regs AS (
        SELECT event_type,
               h48 // {1 << _HLL_WBITS} AS reg,
               MAX(CASE WHEN h48 % {1 << _HLL_WBITS} = 0 THEN {_HLL_WBITS + 1}
                        ELSE {_HLL_WBITS + 1}
                             - length(bin(h48 % {1 << _HLL_WBITS})) END) AS m
        FROM hashed
        GROUP BY event_type, reg
    ),
    summed AS (
        SELECT event_type,
               CAST(SUM(1::BIGINT << ({_HLL_WBITS + 1} - m)) AS BIGINT)
                   + ({_HLL_M} - COUNT(*)) * {1 << (_HLL_WBITS + 1)} AS s_scaled,
               {_HLL_M} - COUNT(*) AS empty_regs
        FROM regs
        GROUP BY event_type
    ),
    exact AS (
        SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
        FROM events GROUP BY event_type
    )
    SELECT s.event_type,
           s.s_scaled,
           CAST(s.empty_regs AS BIGINT) AS empty_regs,
           CAST(e.exact_users AS BIGINT) AS exact_users
    FROM summed s JOIN exact e ON s.event_type = e.event_type
    ORDER BY s.event_type
    """


@query("q_stream_hll_users", oracle=_stream_hll_oracle())
def q_stream_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct-user HyperLogLog maintained BY the
    stream: registers merge across micro-batches with MAX (the other
    mergeable-sketch monoid, complementing q_stream_cms_users's SUM),
    so state is <= 1024 registers per event type no matter how long
    the stream runs — vs a streaming COUNT(DISTINCT) whose state grows
    with the user domain and which Spark disallows in streaming for
    exactly that reason. Complete-mode register output equals the
    batch sketch exactly (MAX is associative/commutative), so the
    DuckDB oracle verifies the full streaming path value-exact; the
    exact count is joined batch-side as the honest-measurement column.
    """
    from .sketches import _HLL_M, _HLL_WBITS, _hexval_col

    stream = read_events_stream(spark, sf_dir)
    h48 = _hexval_col(
        F.md5(F.concat(F.lit("hll:"), F.col("user_id").cast("string"))), 12
    )
    w = F.col("h48") % (1 << _HLL_WBITS)
    rho = F.when(w == 0, F.lit(_HLL_WBITS + 1)).otherwise(
        F.lit(_HLL_WBITS + 1) - F.length(F.bin(w))
    )
    regs_stream = (
        stream.select("event_type", h48.alias("h48"))
        .select(
            "event_type",
            F.shiftright(F.col("h48"), _HLL_WBITS).alias("reg"),
            rho.alias("rho"),
        )
        .groupBy("event_type", "reg")
        .agg(F.max("rho").alias("m"))
    )
    regs = _run_to_memory(regs_stream, spark, mode="complete")
    summed = regs.groupBy("event_type").agg(
        (
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_WBITS + 1} - m)"))
            + (F.lit(_HLL_M) - F.count("*")) * (1 << (_HLL_WBITS + 1))
        )
        .cast("long")
        .alias("s_scaled"),
        (F.lit(_HLL_M) - F.count("*")).cast("long").alias("empty_regs"),
    )
    ev = load_table(spark, sf_dir, "events")
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_users")
    )
    return (
        summed.join(exact, "event_type")
        .select("event_type", "s_scaled", "empty_regs", "exact_users")
        .orderBy("event_type")
    )


def _stream_hourly_hll_oracle() -> str:
    from .sketches import _hexval_sql

    h48 = _hexval_sql("md5('hll:' || CAST(user_id AS VARCHAR))", 12)
    return f"""
    WITH hashed AS (
        SELECT date_trunc('hour', ts) AS h, {h48} AS h48 FROM events
    ),
    regs AS (
        SELECT h,
               h48 // {1 << 42} AS reg,
               MAX(CASE WHEN h48 % {1 << 42} = 0 THEN 43
                        ELSE 43 - length(bin(h48 % {1 << 42})) END) AS m
        FROM hashed
        GROUP BY h, reg
    ),
    summed AS (
        SELECT h,
               CAST(SUM(1::BIGINT << (43 - m)) AS BIGINT)
                   + (64 - COUNT(*)) * {1 << 43} AS s_scaled,
               64 - COUNT(*) AS empty_regs
        FROM regs
        GROUP BY h
    ),
    exact AS (
        SELECT date_trunc('hour', ts) AS h, COUNT(DISTINCT user_id) AS exact_users
        FROM events GROUP BY h
    )
    SELECT strftime(s.h, '%Y-%m-%d %H:%M:%S') AS hour, s.s_scaled,
           CAST(s.empty_regs AS BIGINT) AS empty_regs,
           CAST(e.exact_users AS BIGINT) AS exact_users
    FROM summed s JOIN exact e ON s.h = e.h
    ORDER BY hour
    """


@query("q_stream_hourly_hll", oracle=_stream_hourly_hll_oracle())
def q_stream_hourly_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users PER HOUR from the stream via windowed HLL — the
    production 'unique visitors' dashboard at 100 TB: event-time
    tumbling window x 64 MAX-merged registers, so per-window state is
    64 small integers instead of the user set (which streaming
    COUNT(DISTINCT) would need and Spark therefore disallows). The
    64-register geometry is DELIBERATELY smaller than the batch
    sketch's 1024 (hourly windows hold ~100x fewer distinct users, and
    per-window state multiplies by the open-window count) — a local
    choice, not a drifted copy of the batch constants. A
    watermark bounds how long each window's registers stay resident;
    the register output equals the batch sketch exactly, so the whole
    windowed streaming path is oracle-verified value-exact.
    """
    from .sketches import _hexval_col

    stream = read_events_stream(spark, sf_dir)
    h48 = _hexval_col(
        F.md5(F.concat(F.lit("hll:"), F.col("user_id").cast("string"))), 12
    )
    w = F.col("h48") % (1 << 42)
    rho = F.when(w == 0, F.lit(43)).otherwise(F.lit(43) - F.length(F.bin(w)))
    regs_stream = (
        stream.withWatermark("ts", "2 hours")
        .select(F.window("ts", "1 hour").alias("win"), h48.alias("h48"))
        .select("win", F.shiftright(F.col("h48"), 42).alias("reg"), rho.alias("rho"))
        .groupBy("win", "reg")
        .agg(F.max("rho").alias("m"))
    )
    regs = _run_to_memory(regs_stream, spark, mode="complete")
    summed = regs.groupBy(F.col("win.start").alias("h")).agg(
        (
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 43 - m)"))
            + (F.lit(64) - F.count("*")) * (1 << 43)
        )
        .cast("long")
        .alias("s_scaled"),
        (F.lit(64) - F.count("*")).cast("long").alias("empty_regs"),
    )
    ev = load_table(spark, sf_dir, "events")
    exact = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.countDistinct("user_id").cast("long").alias("exact_users")
    )
    # Formatted at the output boundary like every sibling query: a raw
    # TIMESTAMP column collects through the driver's OS timezone and
    # would shift off-UTC machines.
    return (
        summed.join(exact, "h")
        .select(
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "s_scaled",
            "empty_regs",
            "exact_users",
        )
        .orderBy("hour")
    )


def _stream_bloom_oracle() -> str:
    # Geometry imported from the batch sketch so the streaming twin
    # cannot silently fork on a resize.
    from .sketches import _BLOOM_BITS, _BLOOM_K, _hexval_sql

    def pos(key: str, k: str) -> str:
        return (
            _hexval_sql(
                f"md5(CAST({k} AS VARCHAR) || ':' || CAST({key} AS VARCHAR))", 8
            )
            + f" % {_BLOOM_BITS}"
        )

    return f"""
    WITH ks AS (SELECT unnest(range({_BLOOM_K})) AS k),
    bits AS (
        SELECT DISTINCT {pos("user_id", "k")} AS bit
        FROM events CROSS JOIN ks
    ),
    probe AS (
        SELECT r.range AS uid, {pos("r.range", "k")} AS bit
        FROM range(0, 4096) r CROSS JOIN ks
    ),
    passed AS (
        SELECT uid FROM probe JOIN bits USING (bit)
        GROUP BY uid HAVING COUNT(*) = {_BLOOM_K}
    ),
    truth AS (
        SELECT DISTINCT user_id AS uid FROM events WHERE user_id < 4096
    )
    SELECT CAST((SELECT COUNT(*) FROM passed) AS BIGINT) AS n_pass,
           CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_true,
           CAST((SELECT COUNT(*) FROM passed) AS BIGINT)
               - CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_false_pos
    """


@query("q_stream_bloom_members", oracle=_stream_bloom_oracle())
def q_stream_bloom_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Membership Bloom filter maintained BY the stream — the OR-merge
    monoid completing the streaming-sketch trilogy (HLL registers
    merge with MAX, count-min cells with SUM, Bloom words with
    bit-OR). Each micro-batch ORs its users' bit positions into at
    most 64 BIGINT words of state — the 'have we seen this key'
    structure (already-contacted users, already-crawled URLs) whose
    exact form would need the full key set. The final word table
    equals the batch filter exactly (OR is associative/commutative/
    idempotent — duplicate arrivals are even free), so the whole path
    is oracle-verified: a 4096-id probe sweep reports pass / true /
    false-positive counts.
    """
    from .sketches import _BLOOM_BITS, _BLOOM_K, _hexval_col

    def bloom_bit(k, key):
        return (
            _hexval_col(
                F.md5(F.concat(k.cast("string"), F.lit(":"), key.cast("string"))), 8
            )
            % _BLOOM_BITS
        )

    ks = F.array(*[F.lit(i) for i in range(_BLOOM_K)])
    stream = read_events_stream(spark, sf_dir)
    words_stream = (
        stream.select(F.col("user_id"), F.explode(ks).alias("k"))
        .select(bloom_bit(F.col("k"), F.col("user_id")).alias("bit"))
        .select(
            F.shiftright(F.col("bit"), 6).alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 64 AS INT))").alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
    )
    words = _run_to_memory(words_stream, spark, mode="complete")
    probe = (
        spark.range(0, 4096)
        .select(F.col("id").alias("uid"), F.explode(ks).alias("k"))
        .select("uid", bloom_bit(F.col("k"), F.col("uid")).alias("bit"))
        .select(
            "uid",
            F.shiftright(F.col("bit"), 6).alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit % 64 AS INT))").alias("m"),
        )
    )
    passed = (
        probe.join(F.broadcast(words), "w")
        .filter((F.col("bits").bitwiseAND(F.col("m"))) == F.col("m"))
        .groupBy("uid")
        .agg(F.count("*").alias("hits"))
        .filter(F.col("hits") == _BLOOM_K)
    )
    ev = load_table(spark, sf_dir, "events")
    truth = ev.filter(F.col("user_id") < 4096).select("user_id").distinct()
    n_pass = passed.agg(F.count("*").cast("long").alias("n_pass"))
    n_true = truth.agg(F.count("*").cast("long").alias("n_true"))
    return (
        n_pass.crossJoin(n_true)
        .select(
            "n_pass",
            "n_true",
            (F.col("n_pass") - F.col("n_true")).alias("n_false_pos"),
        )
    )


# ---------------------------------------------------------------------------
# q_stream_anomaly — stateful trailing z-score (streaming twin of
# q_value_anomaly)
# ---------------------------------------------------------------------------

#: Shared final-formula text over the exact integer window sums
#: (v4 = value in e4 fixed-point; s1 = sum(v4), s2 = sum(v4*v4) over
#: the 100 preceding same-type events). Identical text in BOTH engines,
#: so even the >2^53 s2 -> double conversion rounds identically.
_SA_Z = (
    "(CAST(v4 AS DOUBLE) - CAST(s1 AS DOUBLE) / n)"
    " / sqrt((CAST(s2 AS DOUBLE)"
    " - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / n)"
)
_SA_STD4 = (
    "sqrt((CAST(s2 AS DOUBLE)"
    " - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / n)"
)
_SA_FINAL = [
    "event_id",
    "event_type",
    "round(CAST(v4 AS DOUBLE) / 10000.0, 4) AS value",
    f"round({_SA_Z}, 4) AS z",
]
_SA_GUARDS = f"n >= 30 AND {_SA_STD4} > 0.01"


def _stream_anomaly_oracle() -> str:
    return f"""
    WITH v AS (
        SELECT event_id, event_type, ts,
               CAST(round(CAST(value AS DECIMAL(16,4)) * 10000) AS BIGINT) AS v4
        FROM events
        WHERE value IS NOT NULL
    ),
    stats AS (
        SELECT event_id, event_type, v4,
               COUNT(v4) OVER w AS n,
               SUM(v4) OVER w AS s1,
               SUM(v4 * v4) OVER w AS s2
        FROM v
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN 100 PRECEDING AND 1 PRECEDING)
    ),
    scored AS (
        SELECT {", ".join(_SA_FINAL)} FROM stats WHERE {_SA_GUARDS}
    )
    SELECT event_id, event_type, value, z
    FROM scored WHERE abs(z) > 3
    ORDER BY event_type, event_id
    """


@query("q_stream_anomaly", oracle=_stream_anomaly_oracle())
def q_stream_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of q_value_anomaly: per-type trailing-100
    z-score as a CUSTOM STATEFUL operator (``applyInPandasWithState``)
    — the monitoring rule actually deployed as a stream, where the
    batch query's window-over-history is impossible and the state must
    be bounded by design.

    State per event_type is exactly the 100-value ring buffer plus its
    running sums (``buf array<long>, s1 long, s2 long`` — e4
    fixed-point int64, O(1) per-row update: push/evict adjusts the
    sums, no per-row rescan). NULL values are filtered upstream in
    BOTH engines (a NaN would silently poison the integer sums for
    that key forever). Rows inside each micro-batch are sorted by
    (ts, event_id) before folding, so the fold order is the
    deterministic event-time order WITHIN a batch; an event arriving
    in a later micro-batch than a newer one (out-of-order across
    batch boundaries) is folded in arrival order — the standard
    streaming approximation for trailing monitors (exact event-time
    order across batches would need a watermark-deep holdback
    buffer). On the bounded availableNow run the source delivers one
    batch, so the result equals the batch twin exactly — which is
    what the oracle asserts. The operator emits the exact integer
    sufficient statistics; the z formula itself runs JVM-side in ONE
    shared expression text with the DuckDB oracle, so the flagged set
    matches bit-for-bit.

    100 TB posture: state is O(|event_type| x 100) int64s — constant;
    throughput is one shuffle on the state key; output flows through
    the parquet file sink (never the driver). See q_value_anomaly for
    the batch formulation and its chunked-window scale shape.
    """
    import pandas as pd

    def track(key, pdfs, state):
        (event_type,) = key
        if state.exists:
            buf, s1, s2 = state.get
            buf = list(buf)
        else:
            buf, s1, s2 = [], 0, 0
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        out_rows = []
        for eid, v4 in zip(pdf["event_id"].to_list(), pdf["v4"].to_list()):
            n = len(buf)
            if n >= 30:
                out_rows.append((eid, event_type, v4, n, s1, s2))
            buf.append(v4)
            s1 += v4
            s2 += v4 * v4
            if len(buf) > 100:
                old = buf.pop(0)
                s1 -= old
                s2 -= old * old
        state.update((buf, s1, s2))
        yield pd.DataFrame(
            out_rows,
            columns=["event_id", "event_type", "v4", "n", "s1", "s2"],
        )

    ev = read_events_stream(spark, sf_dir)
    v4 = F.expr("CAST(round(CAST(value AS DECIMAL(16,4)) * 10000) AS BIGINT)")
    tracked = (
        ev.filter(F.col("value").isNotNull())
        .select("event_id", "ts", "event_type", v4.alias("v4"))
        .withWatermark("ts", "1 hour")
        .groupBy("event_type")
        .applyInPandasWithState(
            track,
            outputStructType="event_id long, event_type string, v4 long, "
            "n long, s1 long, s2 long",
            stateStructType="buf array<long>, s1 long, s2 long",
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )
    out = _run_to_files(tracked, spark)
    return (
        out.filter(_SA_GUARDS)
        .selectExpr(*_SA_FINAL)
        .filter("abs(z) > 3")
        .orderBy("event_type", "event_id")
    )


# ---------------------------------------------------------------------------
# q_stream_kmv_users — bucketed-minimum (KMV-style) distinct sketch in-stream
# ---------------------------------------------------------------------------

_SKMV_K = 64  # buckets (stochastic averaging); state = k minima per type
_SKMV_DOM = 1 << 48


def _stream_kmv_oracle() -> str:
    from .sketches import _hexval_sql

    h48 = _hexval_sql("md5('kmv:' || CAST(user_id AS VARCHAR))", 12)
    return f"""
    WITH hashed AS (
        SELECT event_type, {h48} AS h48 FROM events
    ),
    mins AS (
        SELECT event_type, h48 % {_SKMV_K} AS bucket,
               CAST(MIN(h48 // {_SKMV_K}) AS BIGINT) AS m
        FROM hashed GROUP BY event_type, bucket
    ),
    summed AS (
        SELECT event_type,
               CAST(SUM(m) AS BIGINT)
                   + ({_SKMV_K} - COUNT(*)) * {_SKMV_DOM // _SKMV_K}
                   AS sum_minima,
               CAST({_SKMV_K} - COUNT(*) AS BIGINT) AS empty_buckets
        FROM mins GROUP BY event_type
    ),
    exact AS (
        SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
        FROM events GROUP BY event_type
    )
    SELECT s.event_type, s.sum_minima, s.empty_buckets,
           CAST({_SKMV_K} * {_SKMV_K} * {_SKMV_DOM // _SKMV_K}
                // (s.sum_minima + {_SKMV_K}) - {_SKMV_K} AS BIGINT)
               AS kmv_est,
           CAST(e.exact_users AS BIGINT) AS exact_users
    FROM summed s JOIN exact e ON s.event_type = e.event_type
    ORDER BY s.event_type
    """


@query("q_stream_kmv_users", oracle=_stream_kmv_oracle())
def q_stream_kmv_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct-user sketch maintained BY the stream
    with the third mergeable-sketch monoid: bucketed-MINIMUM (the
    stochastic-averaging form of KMV/MinCount, Bar-Yossef et al. 2002,
    Giroire 2009) — k=64 buckets each keeping the smallest scaled
    hash seen, merged across micro-batches with MIN (complementing
    the streaming CMS's SUM and the streaming HLL's MAX). State is
    ≤ k minima per event type forever, vs a streaming
    COUNT(DISTINCT), which Spark disallows because its state grows
    with the user domain.

    Estimator: E[min of u uniform on [0,D)] ≈ D/(u+1) per bucket, so
    Σ minima ≈ k·(D/k)/(n/k+1) and n̂ = k²·(D/k) DIV (Σ+k) − k, all
    exact integer arithmetic on engine-identical md5 hashes; empty
    buckets contribute the domain max D/k exactly like HLL's empty
    registers. Complete-mode MIN is associative/commutative, so the
    streamed register table equals the batch sketch value-exact and
    the DuckDB oracle verifies the full streaming path; the exact
    count joins batch-side as the honest-measurement column.
    """
    from .sketches import _hexval_col

    stream = read_events_stream(spark, sf_dir)
    h48 = _hexval_col(
        F.md5(F.concat(F.lit("kmv:"), F.col("user_id").cast("string"))), 12
    )
    mins_stream = (
        stream.select("event_type", h48.alias("h48"))
        .select(
            "event_type",
            (F.col("h48") % _SKMV_K).alias("bucket"),
            F.shiftright(F.col("h48"), 6).alias("hv"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.min("hv").cast("long").alias("m"))
    )
    mins = _run_to_memory(mins_stream, spark, mode="complete")
    summed = mins.groupBy("event_type").agg(
        (
            F.sum("m")
            + (F.lit(_SKMV_K) - F.count("*")) * (_SKMV_DOM // _SKMV_K)
        )
        .cast("long")
        .alias("sum_minima"),
        (F.lit(_SKMV_K) - F.count("*")).cast("long").alias("empty_buckets"),
    )
    ev = load_table(spark, sf_dir, "events")
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_users")
    )
    return (
        summed.join(exact, "event_type")
        .selectExpr(
            "event_type",
            "sum_minima",
            "empty_buckets",
            f"CAST({_SKMV_K} * {_SKMV_K} * {_SKMV_DOM // _SKMV_K}"
            f" DIV (sum_minima + {_SKMV_K}) - {_SKMV_K} AS BIGINT)"
            " AS kmv_est",
            "exact_users",
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q_stream_quantile — log-binned quantile histogram maintained in-stream
# ---------------------------------------------------------------------------

#: Quantiles read off the streamed sketch, in parts-per-million.
_SQ_QS = (500000, 900000)

#: Shared interpolation / geometry texts (see plans/sketches.py —
#: identical binning so the batch and streaming sketches are twins).
_SQ_EST = (
    "CAST(round(CAST(lo AS DOUBLE) + CAST(width AS DOUBLE)"
    " * CAST(r - cum + cnt AS DOUBLE) / CAST(cnt AS DOUBLE)) AS BIGINT)"
)
_SQ_LO = (
    "CASE WHEN bin_id < 8 THEN bin_id"
    " ELSE (8 + bin_id % 8) << ((bin_id >> 3) - 4) END"
)
_SQ_W = (
    "CASE WHEN bin_id < 8 THEN CAST(1 AS BIGINT)"
    " ELSE CAST(1 AS BIGINT) << ((bin_id >> 3) - 4) END"
)


def _stream_quantile_oracle() -> str:
    qs = ", ".join(f"({q})" for q in _SQ_QS)
    return f"""
    WITH c AS (
        SELECT event_type,
               CAST(round(value * 100) AS BIGINT) AS c
        FROM events
    ),
    binned AS (
        SELECT event_type,
               CASE WHEN c < 8 THEN c
                    ELSE length(bin(c)) * 8
                         + ((c >> (length(bin(c)) - 4)) & 7) END AS bin_id
        FROM c
    ),
    bins AS (
        SELECT event_type, bin_id, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM binned GROUP BY 1, 2
    ),
    tot AS (
        SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n
        FROM bins GROUP BY event_type
    ),
    cumb AS (
        SELECT a.event_type, a.bin_id, a.cnt,
               CAST(SUM(b.cnt) AS BIGINT) AS cum
        FROM bins a
        JOIN bins b ON b.event_type = a.event_type AND b.bin_id <= a.bin_id
        GROUP BY 1, 2, 3
    ),
    ranks AS (
        SELECT event_type, q_ppm, n, (q_ppm * n + 999999) // 1000000 AS r
        FROM tot, (VALUES {qs}) AS qs(q_ppm)
    ),
    sel AS (
        SELECT r.event_type, r.q_ppm, r.n, r.r, MIN(cb.bin_id) AS bin_id
        FROM ranks r
        JOIN cumb cb ON cb.event_type = r.event_type AND cb.cum >= r.r
        GROUP BY 1, 2, 3, 4
    ),
    geom AS (
        SELECT s.event_type, s.q_ppm, s.n, s.r, cb.cnt, cb.cum,
               {_SQ_LO.replace("bin_id", "s.bin_id")} AS lo,
               {_SQ_W.replace("bin_id", "s.bin_id")} AS width
        FROM sel s
        JOIN cumb cb ON cb.event_type = s.event_type
                    AND cb.bin_id = s.bin_id
    ),
    vals AS (
        SELECT event_type, c, CAST(COUNT(*) AS BIGINT) AS w
        FROM c GROUP BY 1, 2
    ),
    ecdf AS (
        SELECT event_type, c, w,
               CAST(SUM(w) OVER (PARTITION BY event_type ORDER BY c)
                    AS BIGINT) AS cum
        FROM vals
    ),
    exact AS (
        SELECT r.event_type, r.q_ppm, CAST(MIN(e.c) AS BIGINT) AS exact_c
        FROM ranks r
        JOIN ecdf e ON e.event_type = r.event_type
                   AND e.cum >= r.r AND e.cum - e.w < r.r
        GROUP BY 1, 2
    )
    SELECT g.event_type, g.q_ppm, g.n AS n_rows,
           {_SQ_EST} AS est_c, x.exact_c,
           1000000 * abs(({_SQ_EST}) - x.exact_c) // x.exact_c AS err_ppm
    FROM geom g
    JOIN exact x ON x.event_type = g.event_type AND x.q_ppm = g.q_ppm
    ORDER BY g.event_type, g.q_ppm
    """


@query("q_stream_quantile", oracle=_stream_quantile_oracle())
def q_stream_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type p50/p90 of the value column maintained BY the
    stream with the fourth mergeable-sketch monoid: a log-binned
    COUNT histogram (the DDSketch shape — the streaming twin of
    q_quantile_sketch, same integer bit-arithmetic binning). State is
    ≤ a few hundred (type, bin) counters forever — vs a streaming
    exact percentile, which would need every value in state.

    Counts merge with SUM across micro-batches (complete-mode
    associative aggregate), so the streamed bin table equals the
    batch sketch value-exact and the DuckDB oracle verifies the full
    streaming path bit-for-bit: binning (pure integer — no libm
    log2), rank arithmetic, and the one shared interpolation formula.
    The exact per-type quantiles join batch-side as the honest
    audit columns (value-grouped ECDF under a PARTITIONED window —
    per-type distinct-value relation, never a single-task sort).

    Scale: streaming state is the bin table; the batch read-off runs
    on |types|x|bins| rows; the audit's window parallelism is
    |event_type| — acceptable for an audit column, and the streamed
    sketch itself never touches that path.
    """
    stream = read_events_stream(spark, sf_dir)
    bins_stream = (
        stream.selectExpr(
            "event_type",
            "CAST(round(value * 100) AS BIGINT) AS c",
        )
        .selectExpr(
            "event_type",
            "CASE WHEN c < 8 THEN c ELSE length(bin(c)) * 8"
            " + (shiftright(c, length(bin(c)) - 4) & 7) END AS bin_id",
        )
        .groupBy("event_type", "bin_id")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    bins = _run_to_memory(bins_stream, spark, mode="complete")
    tot = bins.groupBy("event_type").agg(F.sum("cnt").cast("long").alias("n"))
    b = bins.select(
        F.col("event_type").alias("bt"),
        F.col("bin_id").alias("bb"),
        F.col("cnt").alias("bc"),
    )
    cumb = (
        bins.join(
            F.broadcast(b),
            (F.col("bt") == F.col("event_type"))
            & (F.col("bb") <= F.col("bin_id")),
        )
        .groupBy("event_type", "bin_id", "cnt")
        .agg(F.sum("bc").cast("long").alias("cum"))
    )
    ranks = tot.select(
        "event_type",
        F.explode(F.array(*[F.lit(q) for q in _SQ_QS])).alias("q_ppm"),
        "n",
    ).selectExpr(
        "event_type", "q_ppm", "n", "(q_ppm * n + 999999) DIV 1000000 AS r"
    )
    sel = (
        cumb.join(
            F.broadcast(ranks.withColumnRenamed("event_type", "rt")),
            (F.col("rt") == F.col("event_type")) & (F.col("cum") >= F.col("r")),
        )
        .groupBy("event_type", "q_ppm", "n", "r")
        .agg(F.min(F.struct("bin_id", "cnt", "cum")).alias("s"))
        .select("event_type", "q_ppm", "n", "r", "s.bin_id", "s.cnt", "s.cum")
    )
    geom = sel.selectExpr(
        "event_type", "q_ppm", "n", "r", "cnt", "cum",
        f"{_SQ_LO} AS lo",
        f"{_SQ_W} AS width",
    )
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    vals = (
        ev.selectExpr(
            "event_type", "CAST(round(value * 100) AS BIGINT) AS c"
        )
        .groupBy("event_type", "c")
        .agg(F.count("*").cast("long").alias("w"))
    )
    ecdf = vals.withColumn(
        "cum",
        F.sum("w")
        .over(Window.partitionBy("event_type").orderBy("c"))
        .cast("long"),
    )
    exact = (
        ecdf.join(
            F.broadcast(
                ranks.select(
                    F.col("event_type").alias("xt"), "q_ppm", "r"
                )
            ),
            (F.col("xt") == F.col("event_type"))
            & (F.col("cum") >= F.col("r"))
            & (F.col("cum") - F.col("w") < F.col("r")),
        )
        .groupBy("event_type", "q_ppm")
        .agg(F.min("c").cast("long").alias("exact_c"))
    )
    return (
        geom.join(F.broadcast(exact), ["event_type", "q_ppm"])
        .selectExpr(
            "event_type",
            "q_ppm",
            "n AS n_rows",
            f"{_SQ_EST} AS est_c",
            "exact_c",
            f"1000000 * abs(({_SQ_EST}) - exact_c) DIV exact_c AS err_ppm",
        )
        .orderBy("event_type", "q_ppm")
    )


# ---------------------------------------------------------------------------
# q_stream_new_users — growth curve maintained by the stream (MIN state)
# ---------------------------------------------------------------------------


@query(
    "q_stream_new_users",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS day
        FROM events GROUP BY user_id
    ),
    per_day AS (
        SELECT day, CAST(COUNT(*) AS BIGINT) AS new_users
        FROM first_seen GROUP BY day
    )
    SELECT a.day, a.new_users,
           CAST(SUM(b.new_users) AS BIGINT) AS cum_users
    FROM per_day a JOIN per_day b ON b.day <= a.day
    GROUP BY a.day, a.new_users
    ORDER BY a.day
    """,
)
def q_stream_new_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The q_cumulative_users growth curve maintained BY the stream:
    per-user first-seen day as complete-mode MIN state (associative/
    commutative, so micro-batch order cannot change it and the
    streamed state table equals the batch reduction value-exact — the
    DuckDB oracle verifies the full streaming path).

    Unlike the sketch twins, state here is one date per user — the
    honest cost of an EXACT first-seen reduction (same posture as
    q_stream_user_state; the sketch answer to "too many users" is
    q_stream_hll_users / q_stream_kmv_users). The read-off is the
    same calendar-bounded broadcast cumsum as the batch twin — no
    WindowExec anywhere.
    """
    stream = read_events_stream(spark, sf_dir)
    first_stream = (
        stream.select("user_id", F.col("ts").cast("date").alias("day"))
        .groupBy("user_id")
        .agg(F.min("day").alias("day"))
    )
    first_seen = _run_to_memory(first_stream, spark, mode="complete")
    per_day = (
        first_seen.groupBy("day")
        .agg(F.count("*").cast("long").alias("new_users"))
        .localCheckpoint(eager=True)
    )
    b = per_day.select(
        F.col("day").alias("bday"), F.col("new_users").alias("bnew")
    )
    return (
        per_day.join(F.broadcast(b), F.col("bday") <= F.col("day"))
        .groupBy("day", "new_users")
        .agg(F.sum("bnew").cast("long").alias("cum_users"))
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# q_stream_ohlc — hourly OHLC candles maintained by the stream
# ---------------------------------------------------------------------------


@query(
    "q_stream_ohlc",
    oracle="""
    WITH v AS (
        SELECT date_trunc('hour', ts) AS hour, epoch_us(ts) AS tus,
               event_id, CAST(round(value * 100) AS BIGINT) AS c
        FROM events
    )
    SELECT strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           round(CAST((MIN(struct_pack(t := tus, i := event_id, c := c))).c
                      AS DOUBLE) / 100.0, 2) AS open,
           round(CAST(MAX(c) AS DOUBLE) / 100.0, 2) AS high,
           round(CAST(MIN(c) AS DOUBLE) / 100.0, 2) AS low,
           round(CAST((MAX(struct_pack(t := tus, i := event_id, c := c))).c
                      AS DOUBLE) / 100.0, 2) AS close
    FROM v GROUP BY 1 ORDER BY 1
    """,
)
def q_stream_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC candles maintained BY the stream: per-hour state is
    (count, min/max cent, min/max (event-time, id, cent) struct) —
    every component an associative/commutative monoid, so micro-batch
    arrival order cannot change the candle and the streamed table
    equals the batch q_ohlc value-exact (one oracle text serves both).
    'Open' is first BY EVENT TIME, which is exactly what the struct
    MIN encodes — a stream that computed first-by-arrival would be
    nondeterministic under replay.

    State: one candle per open hour, bounded by the time range; at
    100 TB one adds a watermark to age closed hours out of state.
    """
    stream = read_events_stream(spark, sf_dir)
    v = stream.select(
        F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
            "hour"
        ),
        F.unix_micros("ts").alias("tus"),
        "event_id",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("c"),
    )
    candles_stream = v.groupBy("hour").agg(
        F.count("*").cast("long").alias("n_events"),
        F.min(F.struct("tus", "event_id", "c")).alias("o"),
        F.max("c").alias("hi"),
        F.min("c").alias("lo"),
        F.max(F.struct("tus", "event_id", "c")).alias("cl"),
    )
    candles = _run_to_memory(candles_stream, spark, mode="complete")
    return candles.selectExpr(
        "hour",
        "n_events",
        "round(CAST(o.c AS DOUBLE) / 100.0, 2) AS open",
        "round(CAST(hi AS DOUBLE) / 100.0, 2) AS high",
        "round(CAST(lo AS DOUBLE) / 100.0, 2) AS low",
        "round(CAST(cl.c AS DOUBLE) / 100.0, 2) AS close",
    ).orderBy("hour")


# ---------------------------------------------------------------------------
# q_stream_rolling_distinct — sliding 7-day HLL maintained by the stream
# ---------------------------------------------------------------------------


def _stream_rolling_distinct_oracle() -> str:
    from .sketches import _rolling_distinct_oracle_sql

    return _rolling_distinct_oracle_sql()


@query(
    "q_stream_rolling_distinct", oracle=_stream_rolling_distinct_oracle()
)
def q_stream_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The q_rolling_distinct sliding 7-day active-user count with the
    DAY-LEVEL HLL REGISTER TABLE built by the stream: state is
    (day, register) -> MAX(rho) — the HLL MAX monoid again, so
    micro-batch order cannot change a register and the streamed table
    equals the batch build bit-for-bit. The window merge and the
    exact audit run batch-side on the streamed registers (identical
    read-off to the batch twin; one oracle text serves both).

    This is the streaming shape that makes sliding COUNT(DISTINCT)
    tractable in production: the stream maintains per-day sketches
    (bounded: 1024 registers x open days), and ANY trailing window is
    answered later by merging registers — no raw-user replay.
    """
    from .sketches import _HLL_M, _HLL_WBITS, _hexval_col, _rd_read_off

    stream = read_events_stream(spark, sf_dir)
    h48 = _hexval_col(
        F.md5(F.concat(F.lit("hll:"), F.col("user_id").cast("string"))), 12
    )
    w_ = F.col("h48") % (1 << _HLL_WBITS)
    rho = F.when(w_ == 0, F.lit(_HLL_WBITS + 1)).otherwise(
        F.lit(_HLL_WBITS + 1) - F.length(F.bin(w_))
    )
    regs_stream = (
        stream.select(F.col("ts").cast("date").alias("day"), "user_id")
        .select("day", h48.alias("h48"))
        .select(
            "day",
            F.shiftright(F.col("h48"), _HLL_WBITS).alias("reg"),
            rho.alias("rho"),
        )
        .groupBy("day", "reg")
        .agg(F.max("rho").alias("m"))
    )
    # localCheckpoint: the read-off self-joins the register relation
    # (days x days window map), which trips conflicting-reference
    # resolution against the memory-sink view lineage (the batch twin
    # checkpoints at the same spot).
    regs = _run_to_memory(regs_stream, spark, mode="complete").localCheckpoint(
        eager=True
    )
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct()
    return _rd_read_off(regs, ud)


# ---------------------------------------------------------------------------
# q_stream_ab_monitor — live Welch t readout maintained by the stream
# (streaming twin of q_welch_ttest)
# ---------------------------------------------------------------------------


def _stream_ab_oracle() -> str:
    from .hypothesis_tests import _CENTS, _WELCH_FINAL

    return f"""
    WITH p AS (
        SELECT user_id % 2 AS variant, {_CENTS} AS c
        FROM events WHERE event_type = 'purchase'
    ),
    s AS (
        SELECT CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_a,
               CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_b,
               SUM(CASE WHEN variant = 0 THEN c ELSE 0 END) AS s_a,
               SUM(CASE WHEN variant = 1 THEN c ELSE 0 END) AS s_b,
               SUM(CASE WHEN variant = 0 THEN c * c ELSE 0 END) AS ss_a,
               SUM(CASE WHEN variant = 1 THEN c * c ELSE 0 END) AS ss_b
        FROM p
    )
    SELECT {", ".join(_WELCH_FINAL)} FROM s
    """


@query("q_stream_ab_monitor", oracle=_stream_ab_oracle())
def q_stream_ab_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of q_welch_ttest: the experiment dashboard's
    LIVE Welch t readout. The stream maintains per-variant sufficient
    statistics (n, Σcents, Σcents²) as a complete-mode aggregate —
    associative and commutative, so micro-batch arrival order cannot
    change the state, and the availableNow run equals the batch twin
    bit-for-bit (the oracle asserts exactly that). The t/df formulas
    are the SAME shared text as the batch query.

    100 TB posture: state is six integers per variant — constant; the
    per-batch work is one partial-agg'd shuffle on the 2-value
    variant key (map-side combine collapses each task to ≤2 rows
    first, so the tiny key space is a merge point, not a skew point).
    Σcents² rides DECIMAL(38,0), the same overflow posture as the
    batch twin.
    """
    from .hypothesis_tests import _CENTS, _WELCH_FINAL

    stream = read_events_stream(spark, sf_dir)
    per_variant = (
        stream.filter(F.col("event_type") == "purchase")
        .selectExpr("user_id % 2 AS variant", f"{_CENTS} AS c")
        .groupBy("variant")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("c").cast("decimal(38,0)")).alias("s"),
            F.sum((F.col("c") * F.col("c")).cast("decimal(38,0)")).alias(
                "ss"
            ),
        )
    )
    state = _run_to_memory(per_variant, spark, mode="complete")
    s = state.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("variant") == 0, F.col("s"))).alias("s_a"),
        F.max(F.when(F.col("variant") == 1, F.col("s"))).alias("s_b"),
        F.max(F.when(F.col("variant") == 0, F.col("ss"))).alias("ss_a"),
        F.max(F.when(F.col("variant") == 1, F.col("ss"))).alias("ss_b"),
    )
    return s.selectExpr(*_WELCH_FINAL)


# ---------------------------------------------------------------------------
# q_stream_psi — drift gate (PSI) maintained by the stream
# (streaming twin of q_psi's era comparison, over the event stream)
# ---------------------------------------------------------------------------

_SPSI_SPLIT = "2024-01-16"

#: Same integer bit-arithmetic log bin as q_psi/q_quantile_sketch —
#: per-engine shift spelling, identical values.
_SPSI_BIN_DUCK = (
    "CASE WHEN c < 8 THEN c ELSE length(bin(c)) * 8"
    " + ((c >> (length(bin(c)) - 4)) & 7) END"
)
_SPSI_BIN_SPARK = (
    "CASE WHEN c < 8 THEN c ELSE length(bin(c)) * 8"
    " + (shiftright(c, length(bin(c)) - 4) & 7) END"
)


def _stream_psi_oracle() -> str:
    from .stats_ml import _PSI_CELL

    return f"""
    WITH c AS (
        SELECT CAST(round(value * 100) AS BIGINT) AS c,
               CASE WHEN ts < TIMESTAMP '{_SPSI_SPLIT}' THEN 0 ELSE 1 END
                   AS era
        FROM events WHERE event_type = 'purchase'
    ),
    binned AS (SELECT era, {_SPSI_BIN_DUCK} AS bin_id FROM c),
    bins AS (
        SELECT bin_id,
               CAST(SUM(CASE WHEN era = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_a,
               CAST(SUM(CASE WHEN era = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_b
        FROM binned GROUP BY bin_id
    ),
    tot AS (
        SELECT CAST(SUM(n_a) AS BIGINT) AS t_a,
               CAST(SUM(n_b) AS BIGINT) AS t_b,
               CAST(COUNT(*) AS BIGINT) AS nb
        FROM bins
    ),
    cells AS (SELECT {_PSI_CELL} AS contrib_nano FROM bins, tot)
    SELECT t.nb AS n_bins, t.t_a, t.t_b,
           round(CAST(SUM(c.contrib_nano) AS DOUBLE) / 1000000000.0, 6)
               AS psi
    FROM cells c, tot t
    GROUP BY t.nb, t.t_a, t.t_b
    """


@query("q_stream_psi", oracle=_stream_psi_oracle())
def q_stream_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of q_psi: the drift gate maintained BY the
    stream. Purchase values are integer-log-binned (the exact q_psi /
    q_quantile_sketch bit-arithmetic bin, no libm) and counted per
    (era, bin) as a complete-mode aggregate — associative state, so
    micro-batch order cannot change it; the availableNow run equals
    the batch computation bit-for-bit. The PSI read-off reuses q_psi's
    nano-unit round-before-sum cell text over the bounded bin table.

    In production the "era" split is reference-window vs live traffic;
    here it is a fixed mid-range date so both engines see the same
    deterministic partition of the fixture.

    100 TB posture: state is two counters per occupied bin (≤ ~500
    rows) — constant; per-batch work is one partial-agg'd shuffle on
    the bin key; the readout never touches row-scale data.
    """
    from .stats_ml import _PSI_CELL

    stream = read_events_stream(spark, sf_dir)
    binned = (
        stream.filter(F.col("event_type") == "purchase")
        .selectExpr(
            "CAST(round(value * 100) AS BIGINT) AS c",
            f"CASE WHEN ts < TIMESTAMP '{_SPSI_SPLIT}' THEN 0 ELSE 1 END"
            " AS era",
        )
        .selectExpr("era", f"{_SPSI_BIN_SPARK} AS bin_id")
        .groupBy("era", "bin_id")
        .agg(F.count("*").cast("long").alias("n"))
    )
    cells_long = _run_to_memory(binned, spark, mode="complete")
    bins = (
        cells_long.groupBy("bin_id")
        .agg(
            F.sum(F.when(F.col("era") == 0, F.col("n")).otherwise(0))
            .cast("long")
            .alias("n_a"),
            F.sum(F.when(F.col("era") == 1, F.col("n")).otherwise(0))
            .cast("long")
            .alias("n_b"),
        )
        .localCheckpoint(eager=True)
    )
    tot = bins.agg(
        F.sum("n_a").cast("long").alias("t_a"),
        F.sum("n_b").cast("long").alias("t_b"),
        F.count("*").cast("long").alias("nb"),
    )
    cells = bins.crossJoin(F.broadcast(tot)).selectExpr(
        "t_a", "t_b", "nb", f"{_PSI_CELL} AS contrib_nano"
    )
    return cells.groupBy("nb", "t_a", "t_b").agg(
        F.round(F.sum("contrib_nano").cast("double") / 1e9, 6).alias("psi")
    ).selectExpr("nb AS n_bins", "t_a", "t_b", "psi")


# ---------------------------------------------------------------------------
# q_stream_burstiness — Fano/burstiness panel maintained by the stream
# (streaming twin of q_burstiness)
# ---------------------------------------------------------------------------


def _stream_burstiness_oracle() -> str:
    from .hypothesis_tests import _BURST_FINAL

    return f"""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hr,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    s AS (
        SELECT event_type, COUNT(*) AS h, SUM(c) AS s, SUM(c * c) AS ss
        FROM hourly GROUP BY event_type
    )
    SELECT {", ".join(_BURST_FINAL)} FROM s ORDER BY event_type
    """


@query("q_stream_burstiness", oracle=_stream_burstiness_oracle())
def q_stream_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of q_burstiness: the live capacity-planning
    panel. The stream maintains the (event_type, hour) count grid as
    a complete-mode aggregate — associative, so arrival order cannot
    change it and the availableNow run equals batch bit-for-bit; the
    Fano factor / burstiness read-off is the SAME shared text as the
    batch twin over the bounded grid.

    100 TB posture: state is one counter per (type, hour) cell —
    calendar-bounded; per-batch work is one partial-agg'd shuffle on
    the cell key. In production the grid would be watermark-aged; the
    bounded run keeps every cell so the oracle can assert exact
    equality.
    """
    from .hypothesis_tests import _BURST_FINAL

    stream = read_events_stream(spark, sf_dir)
    hourly = (
        stream.select(
            "event_type", F.date_trunc("hour", "ts").alias("hr")
        )
        .groupBy("event_type", "hr")
        .agg(F.count("*").cast("long").alias("c"))
    )
    grid = _run_to_memory(hourly, spark, mode="complete")
    s = grid.groupBy("event_type").agg(
        F.count("*").alias("h"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
    )
    return s.selectExpr(*_BURST_FINAL).orderBy("event_type")


# ---------------------------------------------------------------------------
# q_stream_srm — SRM health gate maintained by the stream
# (streaming twin of q_srm_check)
# ---------------------------------------------------------------------------


def _stream_srm_oracle() -> str:
    from .hypothesis_tests import _SRM_FINAL

    return f"""
    WITH u AS (
        SELECT user_id % 2 AS variant,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS nu
        FROM events GROUP BY user_id % 2
    ),
    s AS (
        SELECT MAX(CASE WHEN variant = 0 THEN nu END) AS na,
               MAX(CASE WHEN variant = 1 THEN nu END) AS nb
        FROM u
    ),
    e AS (SELECT na, nb, CAST(na + nb AS DOUBLE) / 2.0 AS e FROM s)
    SELECT {", ".join(_SRM_FINAL)} FROM e
    """


@query("q_stream_srm", oracle=_stream_srm_oracle())
def q_stream_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of q_srm_check: the assignment-health alarm
    running ON the live stream, where a broken bucketing service is
    actually caught. Distinct users per variant are maintained as
    first-seen state (complete-mode MIN-style aggregate keyed by
    user — the q_stream_new_users posture: exact, one row per user),
    then the χ²-vs-50/50 readout is the SAME shared text as the
    batch gate.

    100 TB posture: state is one row per user (the honest cost of an
    exact distinct; the sketch answer is the HLL/KMV twins);
    per-batch work is one user-keyed partial-agg'd shuffle.
    """
    from .hypothesis_tests import _SRM_FINAL

    stream = read_events_stream(spark, sf_dir)
    seen = (
        stream.selectExpr("user_id % 2 AS variant", "user_id")
        .groupBy("variant", "user_id")
        .agg(F.count("*").alias("_n"))
    )
    users = _run_to_memory(seen, spark, mode="complete")
    u = users.groupBy("variant").agg(
        F.count("*").cast("long").alias("nu")
    )
    s = u.agg(
        F.max(F.when(F.col("variant") == 0, F.col("nu"))).alias("na"),
        F.max(F.when(F.col("variant") == 1, F.col("nu"))).alias("nb"),
    )
    e = s.selectExpr("na", "nb", "CAST(na + nb AS DOUBLE) / 2.0 AS e")
    return e.selectExpr(*_SRM_FINAL)


# ---------------------------------------------------------------------------
# q_stream_timed_funnel — per-user funnel stage machine in-stream
# (custom stateful twin of q_timed_funnel)
# ---------------------------------------------------------------------------


def _stream_funnel_oracle() -> str:
    from .relational_ext import _TF_FINAL, _TF_WINDOW_MIN

    return f"""
    WITH v AS (
        SELECT user_id, MIN(ts) AS tv FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS tc
        FROM events e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'click' AND e.ts > v.tv
          AND e.ts <= v.tv + INTERVAL {_TF_WINDOW_MIN} MINUTE
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS tp
        FROM events e JOIN c ON c.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.tc
          AND e.ts <= c.tc + INTERVAL {_TF_WINDOW_MIN} MINUTE
        GROUP BY e.user_id
    ),
    s AS (
        SELECT (SELECT COUNT(DISTINCT user_id) FROM events) AS n_users,
               (SELECT COUNT(*) FROM v) AS n_view,
               (SELECT COUNT(*) FROM c) AS n_click,
               (SELECT COUNT(*) FROM p) AS n_purchase
    )
    SELECT {", ".join(_TF_FINAL)} FROM s
    """


@query("q_stream_timed_funnel", oracle=_stream_funnel_oracle())
def q_stream_timed_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of q_timed_funnel as a CUSTOM STATEFUL operator
    (``applyInPandasWithState``): each user carries a three-slot
    funnel state machine (first view; first qualifying click within
    60 min of it; first qualifying purchase within 60 min of that) —
    the deployed form of a timed funnel, where the batch query's
    whole-history MINs are impossible and per-user state must be O(1)
    by design.

    State per user is three int64 microsecond timestamps (−1 =
    unreached); rows fold in (ts, event_id) order within the batch,
    and the first-qualifying-transition rule makes the fold equal the
    batch MIN semantics exactly on the bounded availableNow run — the
    oracle (the batch funnel's own SQL) asserts that equality. The
    final percentages reuse the batch readout text.

    100 TB posture: state is 24 bytes/user; throughput is one shuffle
    on the user key; output flows through the file sink (never the
    driver).
    """
    import pandas as pd

    from .relational_ext import _TF_FINAL, _TF_WINDOW_MIN

    win_us = _TF_WINDOW_MIN * 60 * 1_000_000

    def track(key, pdfs, state):
        (user_id,) = key
        if state.exists:
            tv, tc, tp = state.get
        else:
            tv, tc, tp = -1, -1, -1
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        for et, ts in zip(
            pdf["event_type"].to_list(),
            (pdf["ts"].astype("int64") // 1000).to_list(),
        ):
            if et == "view":
                if tv < 0:
                    tv = ts
            elif et == "click":
                if tv >= 0 and tc < 0 and tv < ts <= tv + win_us:
                    tc = ts
            elif et == "purchase":
                if tc >= 0 and tp < 0 and tc < ts <= tc + win_us:
                    tp = ts
        state.update((tv, tc, tp))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "has_v": [1 if tv >= 0 else 0],
                "has_c": [1 if tc >= 0 else 0],
                "has_p": [1 if tp >= 0 else 0],
            }
        )

    ev = read_events_stream(spark, sf_dir)
    staged = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            track,
            outputStructType="user_id long, has_v int, has_c int, has_p int",
            stateStructType="tv long, tc long, tp long",
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )
    out = _run_to_files(staged, spark)
    # One emitted row per (user, micro-batch it appeared in): reduce to
    # the user's LATEST flags (monotone — stages only ever flip 0→1)
    # so the readout stays exact even when the source splits into
    # multiple micro-batches (e.g. maxFilesPerTrigger on a real feed).
    per_user = out.groupBy("user_id").agg(
        F.max("has_v").alias("has_v"),
        F.max("has_c").alias("has_c"),
        F.max("has_p").alias("has_p"),
    )
    s = per_user.agg(
        F.count("*").alias("n_users"),
        F.sum("has_v").alias("n_view"),
        F.sum("has_c").alias("n_click"),
        F.sum("has_p").alias("n_purchase"),
    )
    return s.selectExpr(*_TF_FINAL)


# ---------------------------------------------------------------------------
# q_stream_dsir — DSIR importance models maintained by the stream
# (streaming twin of q_dsir_weights)
# ---------------------------------------------------------------------------

#: Document-stream schema (documents.parquet carries no nano
#: timestamps, so one schema serves both Spark 4.0 and 4.1).
_DOCS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` over the documents parquet — the ingest feed a
    curation pipeline scores continuously. ``pathGlobFilter`` scopes
    the listing to the documents file; a growing directory or Kafka
    topic changes nothing downstream."""
    # recursiveFileLookup lets a replay fixture nest its arrival files
    # inside a documents.parquet/ directory (so the batch reader sees
    # one dataset while the stream sees N arrival units); flat driver
    # fixtures are unaffected, and the leaf glob still scopes the
    # listing to the documents file(s).
    r = (
        spark.readStream.schema(_DOCS_SCHEMA)
        .option("pathGlobFilter", "documents*.parquet")
        .option("recursiveFileLookup", "true")
    )
    mft = os.environ.get("SPARK_GRAFT_STREAM_MAX_FILES_PER_TRIGGER")
    if mft:
        r = r.option("maxFilesPerTrigger", mft)
    return r.parquet(sf_dir)


def _q_stream_dsir_oracle() -> str:
    from .data_selection import _DSIR_ORACLE

    return _DSIR_ORACLE


@query("q_stream_dsir", oracle=_q_stream_dsir_oracle())
def q_stream_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of q_dsir_weights: the two DSIR n-gram models
    (target-domain and raw-pool hashed-bigram bucket counts) are
    maintained BY the stream as one complete-mode aggregate —
    per-bucket occurrence counters, associative state, so micro-batch
    order cannot change them and the availableNow run equals the batch
    models bit-for-bit. The readout then scores the corpus against the
    streamed models through the same shared scoring half
    (``_dsir_score``) and must reproduce q_dsir_weights exactly —
    the oracle IS the batch query's SQL text.

    100 TB posture: state is three integers per occupied bucket
    (<= 256 rows — the hashing trick makes it constant at any corpus
    size); per-batch work is one partial-agg'd shuffle on the bucket
    key. The scoring pass is the batch plan (broadcast cell panel,
    doc-keyed aggregate) applied on demand — in production the models
    update online and candidates are scored as they arrive.
    """
    from .data_selection import _dsir_bigrams, _dsir_score

    stream = read_documents_stream(spark, sf_dir)
    models = (
        _dsir_bigrams(stream)
        .groupBy("b")
        .agg(
            F.count("*").cast("long").alias("cr"),
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
            .cast("long")
            .alias("ct"),
        )
    )
    state = _run_to_memory(models, spark, mode="complete").localCheckpoint(
        eager=True
    )
    raw = state.select("b", "cr")
    tgt = state.select("b", "ct")
    tot = state.agg(
        F.sum("cr").cast("long").alias("tr"),
        F.sum("ct").cast("long").alias("tt"),
    )
    bi = _dsir_bigrams(load_table(spark, sf_dir, "documents"))
    return _dsir_score(bi, raw, tgt, tot)


# ---------------------------------------------------------------------------
# q_stream_toxicity — stateless ingest-time lexicon screen
# (streaming twin of q_toxicity_lexicon)
# ---------------------------------------------------------------------------


def _q_stream_toxicity_oracle() -> str:
    from .data_selection import _TOX_FINAL  # noqa: F401 - shared texts
    from .registry import ORACLE

    return ORACLE["q_toxicity_lexicon"]


@query("q_stream_toxicity", oracle=_q_stream_toxicity_oracle())
def q_stream_toxicity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of q_toxicity_lexicon — the production shape of
    a lexicon safety screen: documents are scored AT INGEST by a
    STATELESS projection (per-doc hit and token counts against the
    literal blocklist array; a document's tokens live in its own row,
    so no shuffle and NO streaming state at all), appended to a file
    sink, and the per-source ledger is the batch rollup of the sink —
    bit-equal to the batch query, whose oracle this twin reuses
    verbatim.

    100 TB posture: zero state, zero shuffle in the stream (the ideal
    streaming operator class — pure filter/annotate at ingest);
    executors write part-files directly, the driver never holds rows;
    the readout aggregates |sources| panels.
    """
    from .data_selection import _TOX_FINAL, _TOX_TERMS

    stream = read_documents_stream(spark, sf_dir)
    lex = F.array(*[F.lit(t) for t in _TOX_TERMS])
    toks = F.filter(
        F.split(F.lower(F.col("text")), " "), lambda t: t != ""
    )
    scored = stream.select(
        "doc_id",
        "source",
        F.size(F.filter(toks, lambda t: F.array_contains(lex, t)))
        .cast("long")
        .alias("h"),
        F.size(toks).cast("long").alias("n"),
    ).filter(F.col("n") > 0)  # batch twin explodes: 0-token docs drop
    out = _run_to_files(scored, spark)
    agg = out.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.when(F.col("h") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_flagged"),
        F.sum("h").cast("long").alias("n_hits"),
        F.sum("n").cast("long").alias("n_tokens"),
    )
    return agg.selectExpr(*_TOX_FINAL).orderBy("source")


# ---------------------------------------------------------------------------
# q_stream_deletion_enforcement — GDPR tombstones applied at ingest
# (streaming enforcement twin of q_deletion_audit's events row)
# ---------------------------------------------------------------------------

_SDEL_FINAL = (
    "CAST(n_events AS BIGINT) AS n_events",
    "CAST(n_suppressed AS BIGINT) AS n_suppressed",
    "CAST(n_kept AS BIGINT) AS n_kept",
    "round(CAST(n_suppressed AS DOUBLE) / n_events, 4) + 0.0"
    " AS suppressed_pct",
)


def _q_stream_deletion_oracle() -> str:
    from .data_selection import _DEL_PCT_BUCKET
    from .sampling import _bucket_sql

    return f"""
    WITH d AS (
        SELECT c_custkey FROM customer
        WHERE {_bucket_sql("gdpr", "c_custkey", 100)} < {_DEL_PCT_BUCKET}
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(*) FILTER (
                   WHERE user_id IN (SELECT c_custkey FROM d))
                   AS BIGINT) AS n_suppressed
        FROM events
    )
    SELECT CAST(n_events AS BIGINT) AS n_events,
           CAST(n_suppressed AS BIGINT) AS n_suppressed,
           CAST(n_events - n_suppressed AS BIGINT) AS n_kept,
           round(CAST(n_suppressed AS DOUBLE) / n_events, 4) + 0.0
               AS suppressed_pct
    FROM s
    """


@query("q_stream_deletion_enforcement", oracle=_q_stream_deletion_oracle())
def q_stream_deletion_enforcement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR tombstone enforcement at ingest: the event stream is
    filtered against the SAME deterministic deletion cohort as
    q_deletion_audit (a static relation joined stream-static), each
    row annotated suppressed/kept by a STATELESS projection and
    appended to the file sink; the readout ledger proves enforcement
    (suppressed + kept = all). This is the production shape of a
    deletion pipeline: the audit (batch) sizes the blast radius, the
    enforcement (stream) guarantees no suppressed user's events reach
    downstream consumers from the moment the tombstone lands.

    100 TB posture: zero streaming state; the cohort joins
    stream-static (broadcast here; at cohort scale a shuffled
    stream-static equi-join — semantics unchanged); executors write
    part-files directly; the readout is a 1-row integer ledger.
    """
    from .data_selection import _DEL_PCT_BUCKET
    from .sampling import hash_bucket

    cust = load_table(spark, sf_dir, "customer")
    d = cust.filter(
        hash_bucket("gdpr", F.col("c_custkey"), 100) < _DEL_PCT_BUCKET
    ).select(F.col("c_custkey").alias("del_key"))
    stream = read_events_stream(spark, sf_dir)
    flagged = (
        stream.join(d, stream.user_id == d.del_key, "left")
        .select(
            "event_id",
            F.col("del_key").isNotNull().alias("suppressed"),
        )
    )
    out = _run_to_files(flagged, spark)
    s = out.agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum(F.when(F.col("suppressed"), 1).otherwise(0))
        .cast("long")
        .alias("n_suppressed"),
    ).withColumn("n_kept", F.col("n_events") - F.col("n_suppressed"))
    return s.selectExpr(*_SDEL_FINAL)


# ---------------------------------------------------------------------------
# q_stream_minhash_dedup — near-dup detection AT INGEST (stateful LSH index)
# ---------------------------------------------------------------------------

# Stateful-op shard count for the streaming LSH index: per-group
# Python invocation cost amortizes over ~(occupied buckets / shards)
# buckets per group; raise at scale so a shard's state slice stays
# O(batch/shards). Output is invariant to this value.
_SMD_SHARDS = 2048

_SMD_FINAL = (
    "source",
    "CAST(n_docs AS BIGINT) AS n_docs",
    "CAST(n_candidates AS BIGINT) AS n_candidates",
    "CAST(n_dups AS BIGINT) AS n_dups",
    "round(CAST(n_dups AS DOUBLE) / n_docs, 4) + 0.0 AS dup_pct",
)


def _q_stream_minhash_dedup_oracle() -> str:
    from .llm import _TOKS_CTE, _shingle_cte

    return f"""
    WITH {_TOKS_CTE},
    {_shingle_cte(3)},
    sig AS (
        SELECT doc, seed, MIN(md5(seed || '#' || shingle)) AS h
        FROM sh CROSS JOIN (SELECT unnest(range(0, 16)) AS seed) seeds
        GROUP BY doc, seed
    ),
    bands AS (
        SELECT doc, seed // 2 AS band,
               md5(string_agg(h, '' ORDER BY seed)) AS bh
        FROM sig GROUP BY doc, band
    ),
    cand AS (
        SELECT b.doc AS doc, MIN(a.doc) AS match
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc < b.doc
        GROUP BY b.doc
    ),
    sizes AS (SELECT doc, COUNT(*) AS n_sh FROM sh GROUP BY doc),
    inter AS (
        SELECT c.doc, c.match, COUNT(*) AS n_inter
        FROM cand c
        JOIN sh a ON a.doc = c.match
        JOIN sh b ON b.doc = c.doc AND b.shingle = a.shingle
        GROUP BY 1, 2
    ),
    ver AS (
        SELECT i.doc FROM inter i
        JOIN sizes sa ON sa.doc = i.match
        JOIN sizes sb ON sb.doc = i.doc
        WHERE round(CAST(n_inter AS DOUBLE)
                    / (sa.n_sh + sb.n_sh - n_inter), 4) >= 0.5
    ),
    panel AS (
        SELECT d.source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(c.doc) AS BIGINT) AS n_candidates,
               CAST(COUNT(v.doc) AS BIGINT) AS n_dups
        FROM documents d
        LEFT JOIN cand c ON c.doc = d.doc_id
        LEFT JOIN ver v ON v.doc = d.doc_id
        GROUP BY d.source
    )
    SELECT {", ".join(_SMD_FINAL)} FROM panel ORDER BY source
    """


@query("q_stream_minhash_dedup", oracle=_q_stream_minhash_dedup_oracle())
def q_stream_minhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate detection AT INGEST — the streaming form of
    MinHash-LSH dedup, where a growing corpus is screened doc-by-doc
    against everything already ingested (the production dedup mode: a
    daily crawl never re-pairs old x old; this is the same idea at
    per-document granularity, the 4th custom
    ``applyInPandasWithState`` operator).

    Pipeline: each arriving document computes its 16 MinHash mins and
    8 LSH band keys as PER-ROW array expressions (a doc's shingles
    live in its own row — zero stream-side shuffle and no streaming
    aggregation, which Spark cannot chain before a stateful op; the
    signature text matches q_minhash_near_dups' oracle exactly). The
    stateful operator is keyed by a SHARD of the bucket space —
    ``pmod(xxhash64(band:bandhash), 2048)`` — and each shard's state
    holds the index slice for its buckets (parallel arrays bucket-key
    -> min doc_id ever ingested). Per bucket the logic is unchanged:
    emit (doc, bucket-min) whenever a doc lands in an occupied
    bucket. Sharding exists purely to amortize
    ``applyInPandasWithState``'s per-GROUP Python overhead: keying by
    raw bucket meant ~38k group invocations per micro-batch at sf0.1
    (~4s of pure per-group fixed cost, the round-9 verdict's top perf
    item); 2048 shards cut invocations ~18x while the per-bucket
    state volume (one int64 + one 35-byte key per occupied bucket)
    is IDENTICAL — it is merely grouped. The batch readout takes
    each doc's earliest match (MIN over its buckets = min sharing doc
    id), verifies that ONE candidate pair by exact shingle Jaccard
    >= 0.5 (the first-wins ingest policy: a doc is deduped against
    its EARLIEST colliding predecessor, not its best match —
    documented, mirrored in the oracle), and reports the per-source
    ingest panel: candidate rate and verified near-dup rate.

    Determinism: arrival is id-ordered (in-batch sort; the
    multi-batch replay fixture splits in order), so a bucket's state
    min when doc d processes equals the min over ALL ids < d in that
    bucket — exactly the batch SQL the oracle runs. Jaccard
    verification happens in the shared batch half.

    100 TB posture: total state is one int64 per OCCUPIED band bucket
    (8 per distinct content cluster — this IS the production LSH
    index, RocksDB-backed at scale); per-batch work is one shuffle on
    the shard key; emissions flow through the file sink (never the
    driver); the readout's verification join touches candidate pairs
    only, never all-pairs. The shard count is the state-granularity
    dial: higher shard counts mean smaller per-group state rows
    (less rewrite amplification per micro-batch when the index
    dwarfs a batch), lower counts mean fewer Python invocations —
    at 100 TB raise ``_SMD_SHARDS`` so a shard's slice stays
    O(batch-rows/shards); any value yields identical output.

    Cost profile (BENCH_AB `q_stream_minhash_dedup_cold_start`, r9):
    the first invocation in a session pays ~5s of ONE-TIME JVM
    JIT/codegen for the tokenize/shingle/16-way-md5 expression chain
    plus state-store/sink init; the r9 warm floor was dominated by
    ~38k per-bucket group invocations — removed by the shard key
    (BENCH_AB `smd_shard_state_key`, r10).
    """
    import pandas as pd

    from ..functions.dedup import _doc_shingles
    from ..functions.text import tokens_col, word_shingles

    stream = read_documents_stream(spark, sf_dir)
    # The 16 per-row MinHash mins are the expensive stage and run in
    # the micro-batch SCAN tasks — one arrival file would compute all
    # signatures on one core. Spread the batch before the signature
    # expressions; state semantics are unaffected (the stateful op
    # re-groups by bucket key and track() sorts in-batch).
    stream = stream.repartition(spark.sparkContext.defaultParallelism)
    toks = stream.select(
        F.col("doc_id").alias("doc"),
        word_shingles(tokens_col(F.lower(F.col("text"))), 3).alias("sh"),
    ).filter(F.size("sh") > 0)
    def _seed_min(i: int):
        # NB: a `lambda s, i=i:` default-arg closure here would be
        # WRONG — pyspark treats a 2-parameter transform lambda as
        # (element, index) and binds the second param to the index
        # column, silently shadowing the seed.
        pref = f"{i}#"
        return F.array_min(
            F.transform(F.col("sh"), lambda s: F.md5(F.concat(F.lit(pref), s)))
        )

    hs = [_seed_min(i) for i in range(16)]
    # Bucket identity is (band, bandhash) — carried as ONE string key
    # so the shard state's index dict needs a single column of keys.
    bands = toks.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.concat(
                        F.lit(f"{j}:"),
                        F.md5(F.concat(hs[2 * j], hs[2 * j + 1])),
                    )
                    for j in range(8)
                ]
            )
        ).alias("bk"),
    ).withColumn("shard", F.pmod(F.xxhash64("bk"), F.lit(_SMD_SHARDS)))

    def track(key, pdfs, state):
        # Shard state: the LSH-index slice for this shard's buckets,
        # as parallel arrays (bucket key -> min doc id ever seen).
        if state.exists:
            bks, mns = state.get
            idx = dict(zip(bks, mns))
        else:
            idx = {}
        parts = [pdf[["doc", "bk"]] for pdf in pdfs]
        pdf = pd.concat(parts) if len(parts) > 1 else parts[0]
        # Ascending doc order within the shard preserves ascending
        # order within every bucket — the arrival-order contract.
        pdf = pdf.sort_values("doc")
        out = []
        for doc, bk in zip(pdf["doc"].to_list(), pdf["bk"].to_list()):
            mn = idx.get(bk)
            if mn is not None and mn < doc:
                out.append((doc, mn))
            if mn is None or doc < mn:
                idx[bk] = doc
        state.update((list(idx.keys()), list(idx.values())))
        # Most shards emit nothing in a batch: skipping the empty
        # DataFrame construction is a measured win.
        if out:
            yield pd.DataFrame(out, columns=["doc", "match"])

    tracked = bands.groupBy("shard").applyInPandasWithState(
        track,
        outputStructType="doc long, match long",
        stateStructType="bks array<string>, mns array<long>",
        outputMode="append",
        timeoutConf="NoTimeout",
    )
    emitted = _run_to_files(
        tracked, spark,
        state_partitions=spark.sparkContext.defaultParallelism,
    )
    cand = emitted.groupBy("doc").agg(F.min("match").alias("match"))

    docs = load_table(spark, sf_dir, "documents")
    sh = _doc_shingles(docs, "text", "doc_id", 3)
    sizes = sh.groupBy("doc").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("doc").alias("match"), "shingle")
    b = sh.select("doc", "shingle")
    inter = (
        cand.join(a, "match")
        .join(b, ["doc", "shingle"])
        .groupBy("doc", "match")
        .agg(F.count("*").alias("n_inter"))
    )
    jac = F.col("n_inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_inter")
    )
    ver = (
        inter.join(
            sizes.select(F.col("doc").alias("match"), F.col("n_sh").alias("n_a")),
            "match",
        )
        .join(sizes.select("doc", F.col("n_sh").alias("n_b")), "doc")
        .filter(F.round(jac, 4) >= 0.5)
        .select("doc")
    )
    panel = (
        docs.select(F.col("doc_id").alias("doc"), "source")
        .join(cand.select("doc", F.lit(1).alias("is_cand")), "doc", "left")
        .join(ver.select("doc", F.lit(1).alias("is_dup")), "doc", "left")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.count("is_cand").cast("long").alias("n_candidates"),
            F.count("is_dup").cast("long").alias("n_dups"),
        )
    )
    return panel.selectExpr(*_SMD_FINAL).orderBy("source")


# ---------------------------------------------------------------------------
# q_stream_rag_chunks — stateless ingest-time RAG chunking
# (streaming twin of q_rag_chunks)
# ---------------------------------------------------------------------------


def _q_stream_rag_chunks_oracle() -> str:
    from . import retrieval  # noqa: F401 - registers the batch twin
    from .registry import ORACLE

    return ORACLE["q_rag_chunks"]


@query("q_stream_rag_chunks", oracle=_q_stream_rag_chunks_oracle())
def q_stream_rag_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of q_rag_chunks — the production shape of a RAG
    ingest pipeline: documents are chunked AT INGEST by a STATELESS
    per-row 1->N explode (a doc's tokens live in its own row — the
    q_stream_toxicity operator class: no shuffle, NO streaming state),
    chunk rows appended to a file sink by the executors directly, and
    the readout is the sink ordered by (doc_id, chunk_id) — bit-equal
    to the batch query, whose oracle this twin reuses verbatim.

    100 TB posture: zero state, zero stream-side shuffle; the 1->N
    fan-out happens inside each micro-batch's scan stage, so a
    continuously-arriving corpus is chunked at wire speed and the
    downstream embedding/indexing jobs consume the sink incrementally.
    """
    from .retrieval import chunk_documents

    stream = read_documents_stream(spark, sf_dir)
    out = _run_to_files(chunk_documents(stream), spark)
    return out.orderBy("doc_id", "chunk_id")


# ---------------------------------------------------------------------------
# q_stream_conformal — ingest-time conformal anomaly gate per event type
# ---------------------------------------------------------------------------

_SCF_FINAL = (
    "event_type",
    "CAST(n_events AS BIGINT) AS n_events",
    "CAST(n_flagged AS BIGINT) AS n_flagged",
    "round(CAST(n_flagged AS DOUBLE) / n_events, 6) AS flag_rate",
    "round(CAST(med_c AS DOUBLE) / 100, 2) AS median_dollars",
    "round(CAST(q_hat_c AS DOUBLE) / 100, 2) AS q_hat_dollars",
)

_SCF_MODEL_SQL = """
    ev AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
        FROM events
    ),
    rk AS (
        SELECT event_type, v,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY v, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM (SELECT event_type, v,
                     ROW_NUMBER() OVER (PARTITION BY event_type
                                        ORDER BY v) AS event_id
              FROM ev)
    ),
    med AS (
        SELECT event_type, v AS med_c FROM rk WHERE rn = (n + 1) // 2
    ),
    resid AS (
        SELECT e.event_type, abs(e.v - m.med_c) AS r
        FROM ev e JOIN med m USING (event_type)
    ),
    rrk AS (
        SELECT event_type, r,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY r) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM resid
    ),
    model AS (
        SELECT k.event_type, m.med_c, k.r AS q_hat_c
        FROM rrk k JOIN med m USING (event_type)
        WHERE k.rn = LEAST((9 * (k.n + 1) + 9) // 10, k.n)
    )
"""


def _q_stream_conformal_oracle() -> str:
    return f"""
    WITH {_SCF_MODEL_SQL},
    flags AS (
        SELECT e.event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(*) FILTER (WHERE abs(e.v - m.med_c) > m.q_hat_c)
                    AS BIGINT) AS n_flagged,
               MAX(m.med_c) AS med_c, MAX(m.q_hat_c) AS q_hat_c
        FROM ev e JOIN model m USING (event_type)
        GROUP BY e.event_type
    )
    SELECT {", ".join(_SCF_FINAL)} FROM flags ORDER BY event_type
    """


@query("q_stream_conformal", oracle=_q_stream_conformal_oracle())
def q_stream_conformal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time conformal anomaly gate — the streaming deployment
    of the split-conformal idea (q_conformal_forecast): a per-type
    model panel (median value, 90th-percentile absolute residual as
    the conformal radius q_hat) is trained BATCH-side and broadcast
    into the stream; every arriving event is flagged statelessly when
    |value - median| > q_hat, and the per-type flag-rate panel is the
    stream's associative aggregate (complete mode — micro-batch order
    cannot change it). In production the panel comes from the
    reference window and the stream is live traffic; on the fixture
    both sides read the same events, so the oracle is the exact batch
    computation.

    Exactness: the median is the exact lower-median order statistic
    (rank (n+1) DIV 2, value+arrival tie-break) and q_hat the exact
    ceil(0.9(n+1))-th absolute residual, both integer cents — the
    flag comparison is pure integer arithmetic.

    Scale: the model panel is |event_types| rows (broadcast); the
    stream side is a stateless projection + join and one partial-
    agg'd count per type — no streaming state beyond the panel
    aggregate, the q_stream_toxicity operator class.
    """
    events = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    ev = events.select(
        "event_type",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("v"),
    )
    wt = Window.partitionBy("event_type").orderBy("v")
    ranked = ev.withColumn("rn", F.row_number().over(wt)).withColumn(
        "n", F.count("*").over(Window.partitionBy("event_type"))
    )
    med = ranked.filter(F.expr("rn = (n + 1) DIV 2")).select(
        "event_type", F.col("v").alias("med_c")
    )
    resid = ev.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("v") - F.col("med_c")).alias("r")
    )
    wr = Window.partitionBy("event_type").orderBy("r")
    model = (
        resid.withColumn("rn", F.row_number().over(wr))
        .withColumn("n", F.count("*").over(Window.partitionBy("event_type")))
        .filter(F.expr("rn = LEAST((9 * (n + 1) + 9) DIV 10, n)"))
        .select("event_type", F.col("r").alias("q_hat_c"))
        .join(F.broadcast(med), "event_type")
        .localCheckpoint(eager=True)
    )
    stream = read_events_stream(spark, sf_dir)
    flags = (
        stream.select(
            "event_type",
            F.expr("CAST(round(value * 100) AS BIGINT)").alias("v"),
        )
        .join(F.broadcast(model), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(
                F.when(
                    F.abs(F.col("v") - F.col("med_c")) > F.col("q_hat_c"), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_flagged"),
            F.max("med_c").alias("med_c"),
            F.max("q_hat_c").alias("q_hat_c"),
        )
    )
    out = _run_to_memory(flags, spark, mode="complete")
    return out.selectExpr(*_SCF_FINAL).orderBy("event_type")


# ---------------------------------------------------------------------------
# q_stream_decontaminate_spans — span-contamination screening AT INGEST
# ---------------------------------------------------------------------------


def _xsd_stream_oracle() -> str:
    from .sampling import _bucket_sql
    from .text_ngram import _XS_HOT, _XS_K, _XS_L

    bucket = _bucket_sql("split", "doc_id")
    return f"""
    WITH toks AS (
        SELECT doc_id AS doc,
               list_filter(string_split(lower(text), ' '), t -> t <> '')
                   AS toks
        FROM documents
    ),
    tagged AS (
        SELECT doc_id AS doc,
               CASE WHEN {bucket} >= 900 THEN 'test' ELSE 'other' END AS split
        FROM documents
    ),
    grams AS (
        SELECT doc, u.pos AS pos, substr(md5(u.gram), 1, 16) AS gh
        FROM (
            SELECT doc,
                   unnest(list_transform(
                       range(1, len(toks) - {_XS_K} + 2),
                       i -> {{'pos': i - 1,
                             'gram': array_to_string(toks[i:i+{_XS_K - 1}], ' ')}})) AS u
            FROM toks)
    ),
    evidx AS (
        SELECT g.doc, g.pos, g.gh
        FROM grams g JOIN tagged t USING (doc) WHERE t.split = 'test'
    ),
    keep AS (
        SELECT gh FROM evidx GROUP BY gh HAVING COUNT(*) <= {_XS_HOT}
    ),
    ev2 AS (
        SELECT e.doc AS ta, e.pos AS pa, e.gh
        FROM evidx e JOIN keep USING (gh)
    ),
    arr AS (
        SELECT g.doc AS tb, g.pos AS pb, g.gh
        FROM grams g JOIN keep USING (gh)
    ),
    pairs AS (
        SELECT ta, pa, tb, pb FROM ev2 JOIN arr USING (gh) WHERE ta <> tb
    ),
    runs AS (
        -- bridged gaps-and-islands (step <= K stays one run; the
        -- skipped grams are index-hot-capped but verbatim-matched)
        SELECT tb, ta, pa - pb AS diag, pb,
               CASE WHEN pb - LAG(pb) OVER (PARTITION BY tb, ta, pa - pb
                                            ORDER BY pb) <= {_XS_K}
                    THEN 0 ELSE 1 END AS ni
        FROM pairs
    ),
    runs2 AS (
        SELECT tb, ta, diag, pb,
               SUM(ni) OVER (PARTITION BY tb, ta, diag ORDER BY pb
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS grp
        FROM runs
    ),
    spans AS (
        SELECT tb FROM runs2 GROUP BY tb, ta, diag, grp
        HAVING MAX(pb) - MIN(pb) + {_XS_K} >= {_XS_L}
    ),
    flagged AS (SELECT DISTINCT tb FROM spans),
    panel AS (
        SELECT d.source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(f.tb) AS BIGINT) AS n_flagged
        FROM documents d LEFT JOIN flagged f ON f.tb = d.doc_id
        GROUP BY d.source
    )
    SELECT source, n_docs, n_flagged,
           round(CAST(n_flagged AS DOUBLE) / n_docs, 6) AS flag_rate
    FROM panel ORDER BY source
    """


@query("q_stream_decontaminate_spans", oracle=_xsd_stream_oracle())
def q_stream_decontaminate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level eval-contamination screening AT INGEST (the
    streaming form of q_decontaminate_spans, and the gate a training
    pipeline actually deploys: every arriving document is checked for
    a verbatim >= 32-token overlap with the BENCHMARK/EVAL set before
    it can enter the training corpus). The eval-set gram index is
    STATIC — built once from the test hash split, hot grams (> 64
    index occurrences) dropped at index-build time — so the screen
    needs NO streaming state: each micro-batch joins its arrivals'
    positional grams against the index and detects same-partner
    diagonal runs with plain batch ops inside ``foreachBatch`` (the
    q_stream_mv execution class), appending one (doc, source, flag)
    row per arrival to the file sink. Batch-boundary invariant by
    construction (an arriving doc's grams live in its own batch; the
    index never changes), which the multi-batch replay test pins.

    Contract: an arrival is flagged if it shares a >= 32-token
    verbatim span with an eval doc OTHER THAN ITSELF (eval docs
    re-arriving are not self-contaminated). The cap lives on the
    INDEX side only — arrival-side corpus frequencies are unknowable
    at ingest time (the honest production form; the batch
    q_decontaminate_spans audits with the corpus-wide cap).

    100 TB posture: eval sets are small (benchmarks), so the index is
    a bounded relation a real deployment broadcasts; per-batch work
    is one gram equi-join + per-(arrival, eval, diag) grouped windows;
    zero state, sink written by executors.
    """
    from ..functions.text import tokens_col, word_shingles
    from .sampling import hash_bucket
    from .text_ngram import _XS_HOT, _XS_K, _XS_L

    docs = load_table(spark, sf_dir, "documents")
    spread = docs.repartition(spark.sparkContext.defaultParallelism)
    is_test = hash_bucket("split", F.col("doc_id")) >= 900
    ev_grams = (
        spread.filter(is_test)
        .select(
            F.col("doc_id").alias("ta"),
            F.posexplode(
                word_shingles(tokens_col(F.lower(F.col("text"))), _XS_K)
            ).alias("pa", "gram"),
        )
        .select("ta", "pa", F.substring(F.md5("gram"), 1, 16).alias("gh"))
    )
    keep = (
        ev_grams.groupBy("gh")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") <= _XS_HOT)
        .select("gh")
    )
    # The static index: bounded (eval sets are small) — pinned once so
    # every micro-batch joins the same relation without recompute.
    ev2 = ev_grams.join(keep, "gh").localCheckpoint(eager=True)

    _gc_previous_sinks(spark)
    root = tempfile.mkdtemp(prefix="stream_xsd_")
    _prev_sink_roots.append(root)
    out_dir = f"{root}/out"

    def screen(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window as W

        b = batch_df.repartition(
            batch_df.sparkSession.sparkContext.defaultParallelism
        )
        base = b.select(
            "doc_id", "source", tokens_col(F.lower(F.col("text"))).alias("toks")
        )
        grams = base.select(
            F.col("doc_id").alias("tb"),
            F.posexplode(word_shingles(F.col("toks"), _XS_K)).alias(
                "pb", "gram"
            ),
        ).select("tb", "pb", F.substring(F.md5("gram"), 1, 16).alias("gh"))
        pairs = grams.join(ev2, "gh").filter(F.col("ta") != F.col("tb"))
        # Bridged gaps-and-islands, as in text_ngram._xs_spans.
        w = W.partitionBy("tb", "ta", F.col("pa") - F.col("pb")).orderBy("pb")
        w_cum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
        step = F.col("pb") - F.lag("pb").over(w)
        spans = (
            pairs.withColumn("ni", F.when(step <= _XS_K, 0).otherwise(1))
            .withColumn("grp", F.sum("ni").over(w_cum))
            .groupBy("tb", "ta", (F.col("pa") - F.col("pb")).alias("diag"), "grp")
            .agg((F.max("pb") - F.min("pb") + _XS_K).alias("span_len"))
            .filter(F.col("span_len") >= _XS_L)
            .select("tb")
            .distinct()
        )
        (
            base.select("doc_id", "source")
            .join(
                spans.withColumnRenamed("tb", "doc_id").withColumn(
                    "flag", F.lit(1)
                ),
                "doc_id",
                "left",
            )
            .select(
                "doc_id", "source", F.coalesce("flag", F.lit(0)).alias("flag")
            )
            .write.mode("append")
            .parquet(out_dir)
        )

    stream = read_documents_stream(spark, sf_dir)
    with _stream_partitions(spark):
        q = (
            stream.writeStream.foreachBatch(screen)
            .option("checkpointLocation", f"{root}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    if not os.path.isdir(out_dir):
        # No arrivals yet (zero micro-batches): an empty panel, not a
        # read error — the gate's steady-state readout on a quiet feed.
        return spark.createDataFrame(
            [], "source string, n_docs long, n_flagged long, flag_rate double"
        )
    out = spark.read.parquet(out_dir)
    panel = out.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("flag").cast("long").alias("n_flagged"),
    )
    return panel.select(
        "source",
        "n_docs",
        "n_flagged",
        F.round(F.col("n_flagged").cast("double") / F.col("n_docs"), 6).alias(
            "flag_rate"
        ),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# q_stream_ivf_assign — ingest-time ANN cell routing (streaming twin of
# the cell_common coarse quantizer)
# ---------------------------------------------------------------------------

_EMB_SCHEMA = "vec_id long, embedding array<float>, label int"


def read_embeddings_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``readStream`` over the embeddings parquet — the vector-ingest
    feed an ANN index routes continuously (same reader contract as
    ``read_documents_stream``: leaf glob + recursive lookup so replay
    fixtures can nest arrival files)."""
    r = (
        spark.readStream.schema(_EMB_SCHEMA)
        .option("pathGlobFilter", "embeddings*.parquet")
        .option("recursiveFileLookup", "true")
    )
    mft = os.environ.get("SPARK_GRAFT_STREAM_MAX_FILES_PER_TRIGGER")
    if mft:
        r = r.option("maxFilesPerTrigger", mft)
    return r.parquet(sf_dir)


def _q_stream_ivf_assign_oracle() -> str:
    from .cell_common import cell_ctes

    return f"""
    WITH {cell_ctes()}
    SELECT cid,
           CAST(COUNT(*) AS BIGINT) AS n_arrivals,
           CAST(SUM(CAST(round(ccos * 10000) AS BIGINT)) AS BIGINT)
               AS sum_ccos_e4
    FROM assign GROUP BY cid ORDER BY cid
    """


@query("q_stream_ivf_assign", oracle=_q_stream_ivf_assign_oracle())
def q_stream_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-time IVF cell routing — the streaming half of every
    cell_common ANN query: arriving vectors are assigned to their
    max-cosine coarse-quantizer cell AT INGEST, so the downstream
    index (q_ivf_ann / q_ivfpq_ann's postings lists) grows
    incrementally instead of being rebuilt. The quantizer (the
    rank-seed centroid panel, ~sqrt(n) rows) is pinned ONCE from the
    settled corpus and broadcast into every micro-batch — the screen
    itself is STATELESS (the q_stream_mv execution class: per-batch
    argmax inside ``foreachBatch``, appended to a file sink by the
    executors). Readout: per-cell arrival counts and the exact e4
    cosine mass (sum of round(ccos*1e4) integers — no
    summation-order float risk), i.e. the cell-population panel the
    batch coarse quantizer produces, which the oracle computes
    directly from the shared cell CTEs.

    100 TB posture: the centroid panel is the ONLY shared state and
    is broadcast-sized by construction (sqrt(n)); per-batch work is
    one broadcast crossJoin + map-side max_by argmax (the
    _argmax_assign discipline — no window, no shuffle of raw
    vectors); arrival rows append to the sink partitioned by nothing
    the driver touches. Batch-boundary invariant by construction
    (per-row stateless screen), pinned by the multi-batch replay
    test.
    """
    from .cell_common import cell_base, rank_seed_centroids, seed_k

    emb = load_table(spark, sf_dir, "embeddings")
    base, _ = cell_base(emb)
    k = seed_k(base)
    cent = rank_seed_centroids(base, k).localCheckpoint(eager=True)

    _gc_previous_sinks(spark)
    root = tempfile.mkdtemp(prefix="stream_ivfassign_")
    _prev_sink_roots.append(root)
    out_dir = f"{root}/out"

    def route(batch_df: DataFrame, batch_id: int) -> None:
        b = batch_df.repartition(
            batch_df.sparkSession.sparkContext.defaultParallelism
        )
        vv = F.transform(F.col("embedding"), lambda x: x.cast("double"))
        nrm = F.sqrt(
            F.aggregate(
                F.transform(F.col("vv"), lambda x: x * x),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
        rows = b.select(
            F.col("vec_id").alias("vid"), vv.alias("vv")
        ).withColumn("nrm", nrm)
        dot = F.aggregate(
            F.zip_with(F.col("vv"), F.col("cv"), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        ccos = F.round(dot / (F.col("nrm") * F.col("cnrm")), 4)
        (
            rows.crossJoin(F.broadcast(cent))
            .withColumn("ccos", ccos)
            .groupBy("vid")
            .agg(
                F.expr("max_by(cid, struct(ccos, -cid))").alias("cid"),
                F.max("ccos").alias("ccos"),
            )
            .select(
                "vid",
                "cid",
                F.round(F.col("ccos") * 10000).cast("long").alias("ccos_e4"),
            )
            .write.mode("append")
            .parquet(out_dir)
        )

    stream = read_embeddings_stream(spark, sf_dir)
    with _stream_partitions(spark):
        q = (
            stream.writeStream.foreachBatch(route)
            .option("checkpointLocation", f"{root}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    if not os.path.isdir(out_dir):
        return spark.createDataFrame(
            [], "cid long, n_arrivals long, sum_ccos_e4 long"
        )
    out = spark.read.parquet(out_dir)
    return (
        out.groupBy("cid")
        .agg(
            F.count("*").cast("long").alias("n_arrivals"),
            F.sum("ccos_e4").cast("long").alias("sum_ccos_e4"),
        )
        .orderBy("cid")
    )
