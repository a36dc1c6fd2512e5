"""Custom stateful streaming operator: per-user sessionization.

The reference ships custom operators to workers through its extension-codec
mechanism (reference ``tests/custom_extension_codec.rs:160-264``); Spark's
analog for *stateful* custom logic is ``applyInPandasWithState`` — state is
hash-partitioned by key (same shuffle a groupBy would use), held in the state
store, and carried across micro-batches, so the operator scales exactly like
a streaming aggregate.

``sessionize_stateful`` assigns events to sessions (a new session starts when
the gap to the previous event of the same user exceeds ``gap_ms``) and emits
the cumulative per-user rollup each micro-batch; the last emission per user is
the final answer. ``sessionize_batch`` is the closed-form batch oracle (lag
window over event time) that the streaming result must converge to on bounded
input — the differential-testing strategy of the reference
(``tests/tpch.rs:168-194``) applied to stateful streaming.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any, Iterable

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("n_sessions", LongType()),
        StructField("last_ts_ms", LongType()),
    ]
)

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("last_ts_ms", LongType()),
        StructField("n_events", LongType()),
        StructField("n_sessions", LongType()),
    ]
)

DEFAULT_GAP_MS = 60 * 60 * 1000  # 1 hour


def sessionize_stateful(events: DataFrame, gap_ms: int = DEFAULT_GAP_MS) -> DataFrame:
    """Streaming sessionization over a DataFrame with ``user_id`` and a
    timestamp column ``ts`` (TIMESTAMP); state = (last event ts, event count,
    session count) per user.

    Rows inside one micro-batch are processed in event-time order; state
    carries the rollup across batches. Emits cumulative counts per user per
    batch (update semantics)."""

    def fn(
        key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_ts, n_events, n_sessions = state.get
        else:
            last_ts, n_events, n_sessions = None, 0, 0
        ts_sorted = pd.concat(list(pdfs))["ts_ms"].sort_values()
        for ts in ts_sorted:
            ts = int(ts)
            if last_ts is None or ts - last_ts > gap_ms:
                n_sessions += 1
            n_events += 1
            last_ts = ts
        state.update((last_ts, n_events, n_sessions))
        yield pd.DataFrame(
            [
                {
                    "user_id": key[0],
                    "n_events": n_events,
                    "n_sessions": n_sessions,
                    "last_ts_ms": last_ts,
                }
            ]
        )

    keyed = events.select(
        "user_id", (F.unix_micros("ts") / 1000).cast("long").alias("ts_ms")
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        fn,
        SESSION_OUTPUT_SCHEMA,
        SESSION_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def sessionize_batch(events: DataFrame, gap_ms: int = DEFAULT_GAP_MS) -> DataFrame:
    """Closed-form batch sessionization (lag window): the oracle the
    streaming operator converges to on bounded input."""
    keyed = events.select(
        "user_id", (F.unix_micros("ts") / 1000).cast("long").alias("ts_ms")
    )
    w = Window.partitionBy("user_id").orderBy("ts_ms")
    gaps = keyed.withColumn(
        "new_session",
        F.when(
            F.lag("ts_ms").over(w).isNull()
            | ((F.col("ts_ms") - F.lag("ts_ms").over(w)) > gap_ms),
            1,
        ).otherwise(0),
    )
    return gaps.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum("new_session").cast("long").alias("n_sessions"),
        F.max("ts_ms").cast("long").alias("last_ts_ms"),
    )
