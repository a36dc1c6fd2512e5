"""The unit-adaptive events source must yield identical ts_ms for every
physical encoding the driver data has ever shipped: TIMESTAMP(NANOS)
(r1-r2), timestamp[us] (r3+), and raw int64 epoch-nanos — round 3's only
correctness rot was a hardcoded-unit assumption meeting drifted data."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datafusion_distributed_experiment_spark.sources.events import (
    events_raw_schema,
    read_events,
    ts_event_time_expr,
    ts_is_raw_nanos,
    ts_ms_expr,
)

# epoch-ns values with sub-ms digits, so unit mistakes cannot cancel out
TS_NS = [1_704_105_870_589_123_000, 1_704_105_999_123_456_000, 1_706_000_000_000_789_000]
WANT_MS = [t // 1_000_000 for t in TS_NS]


def _write(tmp_path, encoding: str) -> str:
    pdf = pd.DataFrame(
        {
            "event_id": range(len(TS_NS)),
            "ts": TS_NS,
            "user_id": [7] * len(TS_NS),
            "event_type": ["click"] * len(TS_NS),
            "value": [1.5] * len(TS_NS),
            "props": ["{}"] * len(TS_NS),
        }
    )
    table = pa.Table.from_pandas(pdf, preserve_index=False)
    if encoding != "int64":
        unit = encoding  # 'ns' | 'us' | 'ms'
        div = {"ns": 1, "us": 1_000, "ms": 1_000_000}[unit]
        ts = pa.array([t // div for t in TS_NS], type=pa.timestamp(unit))
        table = table.set_column(table.schema.get_field_index("ts"), "ts", ts)
    d = tmp_path / encoding
    d.mkdir()
    pq.write_table(table, d / "events.parquet")
    return str(d)


@pytest.mark.parametrize("encoding", ["int64", "ns", "us", "ms"])
def test_ts_ms_identical_across_encodings(spark, tmp_path, encoding):
    sf_dir = _write(tmp_path, encoding)
    out = read_events(spark, sf_dir).orderBy("event_id").collect()
    assert [r.ts_ms for r in out] == WANT_MS
    assert all(r.value_cents == 150 for r in out)


@pytest.mark.parametrize("encoding", ["int64", "ns", "us"])
def test_event_time_expr_matches_ms_expr(spark, tmp_path, encoding):
    """The watermark-capable TIMESTAMP and the integer ts_ms must describe
    the same instant (stream vs batch paths can't drift)."""
    from pyspark.sql import functions as F

    sf_dir = _write(tmp_path, encoding)
    raw = spark.read.schema(events_raw_schema(sf_dir)).parquet(f"{sf_dir}/events.parquet")
    got = raw.select(
        ts_ms_expr(raw).alias("ms"),
        F.unix_micros(ts_event_time_expr(raw)).alias("us2"),
    ).collect()
    assert all(r.ms == r.us2 // 1000 for r in got)


@pytest.mark.parametrize(
    "encoding,want", [("int64", True), ("ns", True), ("us", False), ("ms", False)]
)
def test_probe_classifies_encodings(tmp_path, encoding, want):
    sf_dir = _write(tmp_path, encoding)
    assert ts_is_raw_nanos(sf_dir) is want
    assert ts_is_raw_nanos(f"{sf_dir}/events.parquet") is want  # file path too


def test_probe_warns_on_missing_path_and_unprobeable_files(tmp_path):
    """A wrong path or corrupt events file must surface at the probe (with a
    distinguishing message), not as a confusing downstream schema error."""
    import warnings

    from datafusion_distributed_experiment_spark.sources.events import probe_ts_type

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert probe_ts_type(str(tmp_path / "nope")) == "timestamp[us]"
    assert any("no file found" in str(x.message) for x in w), [str(x.message) for x in w]

    junk = tmp_path / "junk.parquet"
    junk.write_bytes(b"not parquet at all")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert probe_ts_type(str(tmp_path), "junk.parquet") == "timestamp[us]"
    assert any("was probeable" in str(x.message) for x in w), [str(x.message) for x in w]


def test_ntz_expressions_refuse_non_utc_session(spark, tmp_path):
    """The NTZ branch of ts_ms_expr/ts_event_time_expr silently shifts epochs
    on a non-UTC session — it must raise with a pointer to the fix instead."""
    from datafusion_distributed_experiment_spark.sources.events import (
        ts_event_time_expr,
        ts_ms_expr,
    )

    df = spark.sql("SELECT TIMESTAMP_NTZ'2024-01-02 03:04:05' AS ts")
    ts_ms_expr(df)  # UTC session: fine
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    ndf = spark.sql("SELECT CAST(1704164645000000000 AS BIGINT) AS ts")
    try:
        with pytest.raises(ValueError, match="timeZone=UTC"):
            ts_ms_expr(df)
        with pytest.raises(ValueError, match="timeZone=UTC"):
            ts_event_time_expr(df)
        # the EVENT-TIME expr guards its raw-nanos branch too: its LTZ
        # output is rendered back to wall-clock (window.start -> NTZ,
        # date_trunc day keys) in the session tz downstream (round-11 fix)
        with pytest.raises(ValueError, match="timeZone=UTC"):
            ts_event_time_expr(ndf)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    # pure integer epoch math stays timezone-independent and usable anywhere
    assert ts_ms_expr(ndf) is not None
    assert ts_event_time_expr(ndf) is not None


def test_parse_byte_size_accepts_spark_suffixes():
    from datafusion_distributed_experiment_spark.sources.tables import parse_byte_size

    assert parse_byte_size("134217728") == 128 * 1024 * 1024
    assert parse_byte_size("128m") == 128 * 1024 * 1024
    assert parse_byte_size("128M") == 128 * 1024 * 1024
    assert parse_byte_size("128mb") == 128 * 1024 * 1024
    assert parse_byte_size("1g") == 1024**3
    assert parse_byte_size("512k") == 512 * 1024
    assert parse_byte_size("2t") == 2 * 1024**4
    assert parse_byte_size(None) == 128 * 1024 * 1024
    assert parse_byte_size("garbage") == 128 * 1024 * 1024
    assert parse_byte_size("64m", default=1) == 64 * 1024 * 1024
