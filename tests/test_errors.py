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
