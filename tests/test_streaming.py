"""Streaming windowed aggregation converges to the batch oracle.

The batch query queries/adhoc/events_daily.sql defines the semantics; the
streaming path (file source -> watermark -> tumbling window -> memory sink)
must produce the same rows on bounded input."""

from __future__ import annotations

import shutil

import pytest

from datafusion_distributed_experiment_spark.streaming import (
    read_events_stream,
    windowed_counts,
)
from datafusion_distributed_experiment_spark.streaming.events import run_to_completion

from ._compare import assert_frames_match
from .conftest import SF_DIR


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    shutil.copy(f"{SF_DIR}/events.parquet", d / "part-0.parquet")
    return str(d)


def test_streaming_matches_batch_daily(spark, engine, events_dir):
    stream = read_events_stream(spark, events_dir)
    assert stream.isStreaming
    result = run_to_completion(windowed_counts(stream), "t_events_daily").toPandas()

    from datafusion_distributed_experiment_spark import queries as corpus

    batch = engine.sql(corpus.load("adhoc/events_daily")).toPandas()
    assert_frames_match(result, batch, "streaming_vs_batch")


def test_stateful_sessionize_matches_batch(spark, events_dir):
    """applyInPandasWithState sessionization converges to the lag-window
    batch oracle on bounded input (last emission per user = final rollup)."""
    from datafusion_distributed_experiment_spark.streaming.stateful import (
        sessionize_batch,
        sessionize_stateful,
    )

    stream = read_events_stream(spark, events_dir)
    sessions = sessionize_stateful(stream)
    q = (
        sessions.writeStream.format("memory")
        .queryName("t_sessions")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from pyspark.sql import functions as F

    # update-mode memory sink appends one row per user per batch; the
    # cumulative semantics make the max-count row the final state.
    result = (
        spark.table("t_sessions")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("n_sessions").alias("n_sessions"),
            F.max("last_ts_ms").alias("last_ts_ms"),
        )
        .toPandas()
    )

    batch_events = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "user_id", F.expr("timestamp_micros(ts DIV 1000)").alias("ts")
    )
    batch = sessionize_batch(batch_events).toPandas()
    assert_frames_match(result, batch, "stateful_sessionize_vs_batch")


def test_watermark_present_in_plan(spark, events_dir):
    stream = windowed_counts(read_events_stream(spark, events_dir), watermark="2 hours")
    explain = stream._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in explain
