"""Structured Streaming surface over the ``events`` table (SURVEY.md §7.4 —
the reference is strictly batch, §2.9; this is the extension the new engine
adds for stream workloads).

Each streaming query is the *same logical window* as its batch twin in
``plans.events_queries`` — the tests execute both and assert equality, which
is exactly the guarantee Structured Streaming's incremental execution model
makes (batch = stream over a finite source).

Scale posture: watermarks bound state (late events beyond the delay are
dropped instead of growing window state forever); session windows merge
incrementally; the custom stateful operator uses applyInPandasWithState
(Arrow-batched per-group state) with a processing-timeout so idle keys are
evicted. File sources here stand in for Kafka/queue sources — swapping
``readStream.parquet`` for ``readStream.format("kafka")`` changes nothing
downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType


def _stage_dir(path: str) -> str:
    """The file stream source requires a *directory*; the testdata ships one
    bare parquet file per table. Stage it into a per-source temp dir via
    hardlink (fallback: copy). A path that already IS a directory (the
    standard Spark table layout) streams as-is — real deployments stream a
    directory or a Kafka topic and skip this shim entirely."""
    import hashlib
    import os
    import shutil
    import tempfile

    if os.path.isdir(path):
        return path
    key = hashlib.md5(path.encode()).hexdigest()[:12]
    d = os.path.join(tempfile.gettempdir(), f"evstream_{key}")
    target = os.path.join(d, os.path.basename(path))
    if not os.path.exists(target):
        os.makedirs(d, exist_ok=True)
        try:
            os.link(path, target)
        except OSError:
            shutil.copy2(path, target)
    return d


def read_event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (schema from a static
    read; ts normalized from TIMESTAMP(NANOS) exactly like the batch
    loader)."""
    path = f"{sf_dir}/events.parquet"
    # The NTZ→TIMESTAMP normalization below is wall-clock-identical to the
    # batch loader only when the session timezone is UTC; pin it here so a
    # direct caller with a non-UTC session can't get epoch-shifted ts
    # (mirrors plans.registry.load).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        static = spark.read.parquet(path)
    except Exception:
        # TIMESTAMP(NANOS) parquet needs the legacy nanos-as-long read path
        # (mirrors plans.registry.load for driver-owned sessions).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        static = spark.read.parquet(path)
    stream = (spark.readStream.schema(static.schema)
              .parquet(_stage_dir(path)))
    if isinstance(static.schema["ts"].dataType, LongType):
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(static.schema["ts"].dataType, TimestampNTZType):
        # TIMESTAMP(isAdjustedToUTC=false) parquet reads as TIMESTAMP_NTZ;
        # normalize to TIMESTAMP (session tz pinned UTC → same wall clock)
        # so watermarks/epoch arithmetic type-check like the batch loader.
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def tumbling_hourly(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1h window per event_type with a late-data watermark —
    streaming twin of ``events_tumbling_hour``."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                .alias("window_start"), "event_type", "n", "total_value")
    )


def sliding_hourly(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """1h window sliding by 30min — streaming twin of ``events_sliding_hour``."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                .alias("window_start"), "n", "total_value")
    )


def session_windows(events: DataFrame, gap: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Per-user session windows with an inactivity gap — the native
    incremental-merge sessionization (``F.session_window``); twin of the
    lag/cumsum batch plan in ``events_sessionize``."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id",
                F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                .alias("session_start"),
                F.date_format("w.end", "yyyy-MM-dd HH:mm:ss")
                .alias("session_end"),
                "n_events")
    )


def stateful_user_counts(events: DataFrame) -> DataFrame:
    """Custom stateful operator: running per-user event count + last-seen
    timestamp via ``applyInPandasWithState`` (the M-series operators have no
    stateful analogue; this is the §7.4 extension's template for arbitrary
    per-key state machines)."""
    import pandas as pd
    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)

    out_schema = "user_id bigint, n_events bigint, last_ts string"
    state_schema = "n bigint, last_us bigint"

    def update(key, pdf_iter, state: GroupState):
        n, last_us = (state.get if state.exists else (0, 0))
        for pdf in pdf_iter:
            n += len(pdf)
            # arrow hands ts as datetime64[us]
            mx = int(pd.to_datetime(pdf["ts"]).astype("int64").max() // 1000)
            last_us = max(last_us, mx)
        state.update((n, last_us))
        yield pd.DataFrame({
            "user_id": [key[0]],
            "n_events": [n],
            "last_ts": [str(pd.Timestamp(last_us, unit="us"))],
        })

    return (events.groupBy("user_id").applyInPandasWithState(
        update, outputStructType=out_schema, stateStructType=state_schema,
        outputMode="update", timeoutConf=GroupStateTimeout.NoTimeout))


def run_to_memory(stream_df: DataFrame, name: str,
                  output_mode: str = "complete") -> DataFrame:
    """Execute a streaming plan over the finite file source with
    ``trigger(availableNow)`` into an in-memory sink; returns the result
    table. This is the test/benchmark harness — production sinks swap in
    ``format("parquet")``/``foreachBatch`` with checkpointing."""
    q = (stream_df.writeStream.format("memory").queryName(name)
         .outputMode(output_mode).trigger(availableNow=True).start())
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on event_id with bounded state:
    ``dropDuplicatesWithinWatermark`` keeps each key only until the
    watermark passes it, so state size is O(events per watermark window),
    not O(stream history) — the property that makes streaming ingest dedup
    viable at 100 TB/day. Twin of the batch ``dedup_exact`` operator."""
    return (
        events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
    )


def stream_static_enrich(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream–static join: enrich the event stream with a dimension table
    (here customer segment keyed by user_id) and aggregate per segment.
    The static side is planned as a broadcast per micro-batch — no stream
    state is needed for the join itself, only for the aggregation."""
    seg = dim.select(F.col("c_custkey").alias("user_id"),
                     F.col("c_mktsegment").alias("segment"))
    return (
        events.withWatermark("ts", "2 hours")
        .join(F.broadcast(seg), "user_id")
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 4).alias("total_value"))
    )


def stream_stream_conversions(events: DataFrame,
                              horizon: str = "1 hour") -> DataFrame:
    """Stream–stream time-interval join: purchases within ``horizon`` after
    a signup by the same user. Both sides carry watermarks and the join
    condition bounds the event-time range, so Spark can expire buffered
    rows once the watermark passes ``signup.ts + horizon`` — bounded state,
    the streaming analogue of the batch as-of/range joins."""
    signups = (
        events.where(F.col("event_type") == "signup")
        .select(F.col("user_id").alias("s_user"),
                F.col("ts").alias("s_ts"))
        .withWatermark("s_ts", "2 hours")
    )
    purchases = (
        events.where(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("p_user"),
                F.col("ts").alias("p_ts"),
                F.col("value").alias("p_value"))
        .withWatermark("p_ts", "2 hours")
    )
    cond = (
        (F.col("s_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr(f"INTERVAL {horizon}"))
    )
    return (
        signups.join(purchases, cond)
        .select(F.col("s_user").alias("user_id"),
                F.date_format("s_ts", "yyyy-MM-dd HH:mm:ss").alias("signup_ts"),
                F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
                F.col("p_value").alias("purchase_value"))
    )


def write_exactly_once(stream_df: DataFrame, out_dir: str,
                       checkpoint_dir: str):
    """Exactly-once file sink via ``foreachBatch``: each micro-batch lands
    in its own ``batch_id=<n>`` partition directory with ``overwrite``
    mode, so a batch replayed after a crash-restart overwrites its own
    previous (possibly partial) output instead of appending duplicates —
    idempotent writes + the checkpointed offset log = end-to-end
    exactly-once for any sink Spark can overwrite atomically-enough
    (object stores, HDFS, JDBC upserts with the batch id as key).

    Returns the started query; callers ``awaitTermination()``. Reading the
    result is a plain ``spark.read.parquet(out_dir)`` (the batch_id
    partition column is pruned like any other)."""

    def write_batch(df: DataFrame, batch_id: int) -> None:
        df.write.mode("overwrite").parquet(
            f"{out_dir}/batch_id={batch_id}")

    return (stream_df.writeStream
            .foreachBatch(write_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def read_document_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the documents parquet (schema from a
    static read; no timestamp normalization needed — the table carries
    no temporal columns)."""
    path = f"{sf_dir}/documents.parquet"
    static = spark.read.parquet(path)
    return spark.readStream.schema(static.schema).parquet(_stage_dir(path))
