"""Structured Streaming over the ``events`` table shape
(event_id, ts, user_id, event_type, value, props).

The reference has no streaming surface (SURVEY §1.4); these are the
north-star extensions expressed idiomatically: ``readStream`` ->
event-time windowed aggregation with watermarked late-data handling
-> sink. The same transformation functions run on batch DataFrames
(Structured Streaming's unified-API property), which is how the
DuckDB oracle can check their semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def load_events(spark: SparkSession, path: str) -> DataFrame:
    """Batch loader for the driver's events parquet, which stores
    TIMESTAMP(NANOS) — not readable as a Spark timestamp directly.
    With ``spark.sql.legacy.parquet.nanosAsLong=true`` (set by the
    session factory) the column arrives as nanos-since-epoch; convert
    to a proper timestamp at microsecond precision."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # parquet timestamp[us] with isAdjustedToUTC=false reads as
        # TIMESTAMP_NTZ; the session TZ is pinned to UTC (session.py),
        # so the cast is a pure re-tag with identical wall-clock values
        # and keeps time functions (unix_micros etc.) applicable.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def read_events_stream(spark: SparkSession, path: str, max_files_per_trigger: int = 8) -> DataFrame:
    """File-source stream over a directory of events parquet files
    (micros timestamps, e.g. produced by ``load_events(...).write``)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time window x event_type: count + value sum.

    Works on a stream (with watermark-bounded state) and on a batch
    frame (watermark is a no-op there) — one definition, two
    execution modes.
    """
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # DECIMAL sum: exact regardless of aggregation order, so
            # stream == batch == external oracle, bit-for-bit
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


def user_activity(events: DataFrame, window: str = "1 day", watermark: str = "2 days") -> DataFrame:
    """Per-user per-window activity rollup (streaming-safe)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # exact distinct, spelled streaming-safe (count_distinct is
            # rejected on streams; collect_set is an ordinary agg)
            F.size(F.collect_set("event_type")).alias("n_event_types"),
        )
        .select(F.col("w.start").alias("window_start"), "user_id", "n_events", "n_event_types")
    )


def dedup_events(
    events: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Exact dedup of an event stream (at-least-once sources re-deliver):
    drop rows whose key was already seen within the watermark horizon.

    Streaming: ``dropDuplicatesWithinWatermark`` — state per key is
    evicted once the watermark passes, so memory is O(keys per
    horizon), not O(stream history); the dedup guarantee holds for
    re-deliveries arriving closer than the watermark, which is the
    at-least-once delivery window in practice. Batch: plain
    ``dropDuplicates`` — one shuffle, map-side partial dedup; the same
    call works in both modes (unified API, like the window aggs above).
    """
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(list(keys))
    return events.dropDuplicates(list(keys))


def run_stream_to_memory(
    stream_df: DataFrame, query_name: str, timeout_s: int = 600, output_mode: str = "complete"
) -> None:
    """Drain a bounded file-source stream into an in-memory sink
    (test/debug helper): availableNow processes the whole backlog in
    watermark-respecting micro-batches, then stops. Stateful
    append-mode operators (e.g. sessionize_stream) must pass
    ``output_mode='append'``.

    The drain either COMPLETES or RAISES: a query still active at the
    deadline is stopped and reported, never left for the caller to
    read a silently-partial sink (a truncated drain under CPU
    contention looks exactly like a correctness bug downstream).

    The checkpoint goes under the session scratch dir
    (:func:`~cs533_big_data_data_mining_spark.session._local_dir` —
    memory-backed when available, ``SPARK_GRAFT_LOCAL_DIR`` to
    override) instead of Spark's ``java.io.tmpdir`` default: every
    micro-batch commits offsets + per-partition state-store deltas
    with fsyncs, so on a spinning ``/tmp`` the commit latency, not
    the data, dominates a bounded drain. Removed afterwards either
    way (this helper is for bounded test streams; production sinks
    pass their own durable checkpointLocation)."""
    import shutil
    import tempfile

    from cs533_big_data_data_mining_spark.session import _local_dir

    ckpt = tempfile.mkdtemp(prefix=f"ckpt_{query_name}_", dir=_local_dir())
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(query_name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(timeout_s):
            q.stop()
            raise RuntimeError(
                f"stream {query_name!r} did not drain within {timeout_s}s "
                "(overloaded host or a genuine hang) — partial sink discarded"
            )
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
