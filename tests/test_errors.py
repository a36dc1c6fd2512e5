"""Error propagation: original messages survive the executor->driver boundary.

Mirrors the reference's error-propagation integration test (a custom operator
fails remotely; the client asserts the exact original message after two
network hops — reference tests/error_propagation.rs:27-69) and its error
taxonomy round-trip (src/errors/datafusion_error.rs:282-405)."""

from __future__ import annotations

import pytest

from datafusion_distributed_experiment_spark import (
    ExecutionError,
    PlanningError,
    map_exception,
)


def test_parse_error_is_planning_error(engine):
    with pytest.raises(PlanningError) as exc:
        engine.sql("SELEC 1")
    assert "SELEC" in str(exc.value) or "PARSE_SYNTAX_ERROR" in str(exc.value)


def test_missing_table_is_planning_error(engine):
    with pytest.raises(PlanningError) as exc:
        engine.sql("SELECT * FROM definitely_not_a_table")
    assert "definitely_not_a_table" in str(exc.value)


def test_udf_failure_message_survives_to_driver(engine):
    """The analog of the reference's ErrorExec: a failing Python UDF on
    executors must surface its original message on the driver."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    @F.udf(returnType=LongType())
    def explode_now(x):
        raise ValueError("something failed: 12345-marker")

    df = engine.table("nation").select(explode_now(F.col("n_nationkey")))
    with pytest.raises(Exception) as exc:
        df.collect()
    assert "something failed: 12345-marker" in str(exc.value)


def test_map_exception_preserves_message():
    err = map_exception(RuntimeError("original text here"))
    assert isinstance(err, ExecutionError)
    assert "original text here" in str(err)


def test_custom_source_failure_message_survives_to_driver(spark):
    """The closest Spark analog of the reference's ErrorExec (a CUSTOM
    operator that always fails remotely, tests/error_propagation.rs:27-69):
    a Python DataSource whose read() raises on executors must surface the
    original message on the driver."""
    from pyspark.sql.datasource import DataSource, DataSourceReader

    class _BoomSource(DataSource):
        @classmethod
        def name(cls):
            return "boom_source"

        def schema(self):
            return "x bigint"

        def reader(self, schema):
            return _BoomReader()

    class _BoomReader(DataSourceReader):
        def read(self, partition):
            raise ValueError("remote source failed: 67890-marker")
            yield  # pragma: no cover - makes this a generator

    try:
        spark.dataSource.register(_BoomSource)
    except Exception as exc:  # already registered by a previous test run
        if "DATA_SOURCE_ALREADY_EXISTS" not in str(exc):
            raise
    with pytest.raises(Exception) as exc:
        spark.read.format("boom_source").load().collect()
    assert "remote source failed: 67890-marker" in str(exc.value)
