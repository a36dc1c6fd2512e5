"""Unit-adaptive events source — the ONE place that knows how ``ts`` is
physically encoded in ``events.parquet``.

The driver's synthetic events table has shipped two encodings across rounds:
TIMESTAMP(NANOS) (surfaced as BIGINT nanoseconds under
``spark.sql.legacy.parquet.nanosAsLong``) and ``timestamp[us]`` (surfaced as
TIMESTAMP_NTZ). Hardcoding either assumption silently corrupts every derived
timestamp when the data drifts — exactly what schema-inference-driven loading
in the reference avoids (reference tests/tpch.rs:155,
benchmarks/src/tpch/run.rs:329). This module probes the parquet footer
(driver-side metadata only — no data read, one footer fetch even at 100 TB)
and derives:

- ``ts_ms``  — exact integer epoch-milliseconds (BIGINT), the batch currency
  shared with the DuckDB oracles (``epoch_ns(ts) // 1000000``);
- event-time TIMESTAMP (with local timezone, session tz = UTC) — the
  watermark-capable form Structured Streaming requires.

Both derivations truncate toward floor on positive epochs, so
ns → μs → ms double-truncation equals direct ns → ms truncation and the
batch/stream/oracle values agree bit-for-bit whichever encoding the file has.
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)


def probe_ts_type(path: str, pattern: str | None = None) -> str:
    """Physical arrow type string of the ``ts`` column (e.g. ``timestamp[us]``,
    ``timestamp[ns]``, ``int64``) from footer metadata only.

    ``path`` may be a single parquet file or a directory of event files;
    ``pattern`` narrows a directory the way the streaming source's
    ``pathGlobFilter`` does. Falls back to ``timestamp[us]`` (the driver's
    current encoding) when nothing is probeable — with a warning, so a wrong
    path or corrupt file surfaces HERE instead of as a downstream
    schema/read error (a successful probe that happens to match the
    fallback stays silent; only the un-probed fallback warns)."""
    import warnings

    candidates = [path] if os.path.isfile(path) else sorted(
        _glob.glob(os.path.join(path, pattern or "*"))
    )
    for cand in candidates:
        try:
            import pyarrow.dataset as ds

            return str(ds.dataset(cand, format="parquet").schema.field("ts").type)
        except Exception:  # noqa: BLE001 - skip non-parquet/dissimilar files
            continue
    if not candidates:
        warnings.warn(
            f"probe_ts_type: no file found at {path!r}"
            + (f" (pattern {pattern!r})" if pattern else "")
            + "; assuming ts is timestamp[us]",
            stacklevel=2,
        )
    else:
        warnings.warn(
            f"probe_ts_type: none of {len(candidates)} candidate file(s) under "
            f"{path!r} was probeable parquet with a 'ts' column; assuming "
            "timestamp[us]",
            stacklevel=2,
        )
    return "timestamp[us]"


def ts_is_raw_nanos(path: str, pattern: str | None = None) -> bool:
    """True when Spark will surface ``ts`` as BIGINT nanoseconds: either the
    file stores raw int64 epoch-nanos, or TIMESTAMP(NANOS) which the
    ``nanosAsLong`` conf maps to BIGINT (Spark has no nanosecond timestamp)."""
    t = probe_ts_type(path, pattern)
    return t == "int64" or t.startswith("timestamp[ns")


def events_raw_schema(path: str, pattern: str | None = None) -> StructType:
    """Explicit read schema for the events table, ``ts`` typed to match the
    file's physical encoding (streaming file sources cannot infer)."""
    ts_type = LongType() if ts_is_raw_nanos(path, pattern) else TimestampNTZType()
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", ts_type),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


_UTC_ALIASES = {"UTC", "Etc/UTC", "GMT", "Etc/GMT", "Z", "+00:00", "GMT0", "UCT"}


def _require_utc_session(df: DataFrame, why: str) -> None:
    """The NTZ ⇄ TIMESTAMP casts below interpret wall-clock values in the
    SESSION timezone; on a non-UTC session they would silently shift every
    epoch value. The engine sets UTC (session.default_spark_conf), so this
    only trips externally-built sessions — fail loudly with the fix instead
    of corrupting timestamps."""
    # No fallback arg: RuntimeConfig.get VALIDATES an explicit default
    # against the conf entry (an empty-string fallback throws
    # INVALID_CONF_VALUE on sessions that never set the key); the no-default
    # form resolves to the entry's own default (the JVM timezone).
    tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    if tz not in _UTC_ALIASES:
        raise ValueError(
            f"{why} requires spark.sql.session.timeZone=UTC (got {tz!r}): "
            "NTZ timestamps are interpreted in the session timezone. Apply "
            "datafusion_distributed_experiment_spark.session.configure_session "
            "(or set the conf) before reading events."
        )


def ts_ms_expr(df: DataFrame, col: str = "ts") -> Column:
    """Exact integer epoch-ms from ``col`` whatever form it arrived in.
    Matches the DuckDB spelling ``epoch_ns(ts) // 1000000`` bit-for-bit."""
    if dict(df.dtypes).get(col) == "bigint":  # raw nanoseconds
        return F.expr(f"{col} DIV 1000000")
    _require_utc_session(df, f"ts_ms_expr({col!r})")
    return F.expr(f"unix_micros(CAST({col} AS TIMESTAMP)) DIV 1000")


def ts_event_time_expr(df: DataFrame, col: str = "ts") -> Column:
    """Watermark-capable TIMESTAMP (with local timezone; session tz is UTC so
    wall-clock values match the NTZ batch path).

    The UTC guard fires on BOTH branches: ``timestamp_micros`` itself is
    timezone-independent, but every consumer of the returned LTZ column
    renders it back to wall-clock in the SESSION timezone (``window.start``
    cast to NTZ, ``date_trunc`` day keys in the streaming queries) — so a
    nanos-encoded file on a non-UTC session would shift every day boundary
    against the oracle just as silently as the NTZ branch would (review
    fix, round 11: the guard previously covered only the NTZ branch)."""
    _require_utc_session(df, f"ts_event_time_expr({col!r})")
    if dict(df.dtypes).get(col) == "bigint":  # raw nanoseconds -> microseconds
        return F.expr(f"timestamp_micros({col} DIV 1000)")
    return F.col(col).cast("timestamp")


def ts_cutoff_literal(df: DataFrame, ms: int, col: str = "ts") -> Column:
    """A FOLDABLE literal equal to epoch-``ms`` in ``col``'s physical type,
    for pushdown-eligible time-range predicates on the RAW column.

    Predicates on derived values (``ts_ms DIV 86400000 = day``) never reach
    the parquet scan — Spark only pushes comparisons against the stored
    column. Comparing ``col`` to this literal (``>=``/``<``) produces a
    pushed filter whichever encoding the file has (BIGINT nanos or
    TIMESTAMP_NTZ), which is what lets a day-scoped incremental job prune
    row groups / partitions instead of scanning history."""
    if dict(df.dtypes).get(col) == "bigint":  # raw nanoseconds
        return F.lit(ms * 1_000_000)
    _require_utc_session(df, f"ts_cutoff_literal({col!r})")
    return F.expr(f"CAST(timestamp_millis({ms}) AS TIMESTAMP_NTZ)")


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch events in the shared normalized form: ``ts_ms`` (exact BIGINT ms)
    and ``value_cents`` (deterministic integer money), one row per event.

    DuckDB-oracle equivalent: :data:`DUCK_EVENTS_MS`."""
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    return raw.select(
        "event_id",
        "user_id",
        "event_type",
        ts_ms_expr(raw).alias("ts_ms"),
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
    )


DUCK_EVENTS_MS = """
    SELECT event_id, user_id, event_type,
           epoch_ns(ts) // 1000000 AS ts_ms,
           CAST(ROUND(value * 100) AS BIGINT) AS value_cents
    FROM events
"""
