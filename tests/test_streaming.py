"""Streaming = batch equivalence: every streaming window must produce the
same result as its batch twin over the finite events source (SURVEY §7.4)."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events_batch(spark):
    from spark_sentiment_spark.plans.registry import load

    return load(spark, SF_DIR, "events")


@pytest.fixture(scope="module")
def events_stream(spark):
    from spark_sentiment_spark.streaming.streams import read_event_stream

    return read_event_stream(spark, SF_DIR)


def test_tumbling_stream_equals_batch(spark, events_stream, events_batch):
    from spark_sentiment_spark.streaming.streams import (run_to_memory,
                                                         tumbling_hourly)

    got = run_to_memory(tumbling_hourly(events_stream), "t_tumble")
    want = (
        events_batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                .alias("window_start"), "event_type", "n", "total_value")
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_sliding_stream_equals_batch(spark, events_stream, events_batch):
    from spark_sentiment_spark.streaming.streams import (run_to_memory,
                                                         sliding_hourly)

    got = run_to_memory(sliding_hourly(events_stream), "t_slide")
    want = (
        events_batch.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 4).alias("total_value"))
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                .alias("window_start"), "n", "total_value")
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_session_stream_matches_batch_session_count(spark, events_stream,
                                                    events_batch):
    """session_window totals must agree with the batch lag/cumsum
    sessionization (same 1h gap): same per-user session count and the same
    total event count."""
    from spark_sentiment_spark.plans.registry import REGISTRY, all_queries
    from spark_sentiment_spark.streaming.streams import (run_to_memory,
                                                         session_windows)

    got = run_to_memory(session_windows(events_stream), "t_sess")
    stream_counts = (got.groupBy("user_id")
                     .agg(F.count(F.lit(1)).alias("n_sessions"),
                          F.sum("n_events").alias("n_events")))
    all_queries()
    batch = REGISTRY["events_sessionize"].fn(spark, SF_DIR).select(
        "user_id", "n_sessions", "n_events")
    diff = stream_counts.select("user_id",
                                F.col("n_sessions").cast("long"),
                                F.col("n_events").cast("long")) \
        .exceptAll(batch.select("user_id",
                                F.col("n_sessions").cast("long"),
                                F.col("n_events").cast("long")))
    assert diff.count() == 0


def test_stateful_user_counts(spark, events_stream, events_batch):
    from spark_sentiment_spark.streaming.streams import (run_to_memory,
                                                         stateful_user_counts)

    got = run_to_memory(stateful_user_counts(events_stream), "t_state",
                        output_mode="update")
    # one availableNow batch → one emission per user with the full count
    want = events_batch.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"))
    diff = (got.select("user_id", F.col("n_events").cast("long"))
            .exceptAll(want.select("user_id",
                                   F.col("n_events").cast("long"))))
    assert diff.count() == 0


def test_watermark_in_plan(events_stream):
    """The watermark must survive into the analyzed plan (late-data bound =
    bounded state at scale)."""
    from spark_sentiment_spark.streaming.streams import tumbling_hourly

    plan = tumbling_hourly(events_stream)._jdf.queryExecution().analyzed().toString()
    assert "watermark" in plan.lower()
