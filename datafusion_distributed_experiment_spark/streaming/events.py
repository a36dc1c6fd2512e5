"""Streaming ingestion + windowed aggregation for the events table.

Scale notes: the file source discovers new files incrementally (object-store
listing only); the windowed aggregate is a streaming stateful operator whose
state is bounded by the watermark — late rows beyond ``watermark`` are
dropped, everything else lands in its event-time window. State is partitioned
by (window, event_type), the same hash shuffle a batch groupBy would use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

# Streaming file sources require an explicit schema (no inference at runtime).
# ``ts`` arrives as BIGINT nanos (the driver parquet's physical type under
# nanosAsLong) and is converted below — same convention as the batch source.
EVENTS_RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 8
) -> DataFrame:
    """``readStream`` over a parquet directory of event files.

    ``max_files_per_trigger`` bounds micro-batch size (and lets tests force
    multi-batch execution to exercise cross-batch state)."""
    df = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
    # Watermarks require TIMESTAMP (with local timezone), not NTZ; the
    # session timezone is UTC so wall-clock values match the batch NTZ path.
    return df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))


def windowed_counts(
    events: DataFrame, window: str = "1 day", watermark: str = "1 day"
) -> DataFrame:
    """Tumbling-window counts/sums per event type with late-data handling.

    On bounded input this converges to queries/adhoc/events_daily.sql
    (window start == date_trunc('day', ts) for the 1-day window)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("event_type"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            (
                F.sum(F.round(F.col("value") * 1e4).cast("long")) / F.lit(1e4)
            ).alias("total_value"),
        )
        .select(
            F.col("window.start").cast("timestamp_ntz").alias("day"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def run_to_completion(stream_df: DataFrame, query_name: str = "events_windowed") -> DataFrame:
    """Drain a bounded stream with an availableNow trigger into a memory sink
    and return the final table (test/verification harness)."""
    spark = stream_df.sparkSession
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(query_name)
