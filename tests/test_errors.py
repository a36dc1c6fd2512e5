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


# ------------------------------------------------------------------ #
# Execution-subtype taxonomy (reference src/errors/datafusion_error.rs
# round-trips 19 variants, test at :282-405; the Spark analog classifies
# the wrapped JVM/Arrow failure by its stable error-class markers while
# preserving the exact message)
# ------------------------------------------------------------------ #


@pytest.mark.parametrize(
    "marker_msg,expected",
    [
        ("java.io.FileNotFoundException: /no/such/file", "StorageError"),
        ("[PATH_NOT_FOUND] Path does not exist: file:/x", "StorageError"),
        ("java.nio.file.NoSuchFileException: part-0000", "StorageError"),
        (
            "[PARQUET_COLUMN_DATA_TYPE_MISMATCH] column x: INT64 vs DOUBLE",
            "SchemaMismatchError",
        ),
        ("Parquet column cannot be converted in file y", "SchemaMismatchError"),
        ("Failed to merge incompatible data types bigint and string", "SchemaMismatchError"),
        ("RuntimeException: file is not a Parquet file (length too small)", "DataFormatError"),
        ("[CANNOT_READ_FILE_FOOTER] Could not read footer for file", "DataFormatError"),
        ("pyarrow.lib.ArrowInvalid: Schema at index 0 was malformed", "DataFormatError"),
        ("java.lang.OutOfMemoryError: Java heap space", "ResourceError"),
        (
            "Total size of serialized results of 3 tasks is bigger than spark.driver.maxResultSize",
            "ResourceError",
        ),
        ("plain runtime failure with no recognizable class", "ExecutionError"),
    ],
)
def test_execution_subtype_roundtrip(marker_msg, expected):
    """Every variant case preserves the EXACT original message (the
    reference's per-variant assertion) and lands in the documented
    subtype. An OOM-while-reading message containing both a resource and a
    storage marker must classify as the resource variant (marker order)."""
    import datafusion_distributed_experiment_spark as pkg

    err = map_exception(RuntimeError(marker_msg))
    assert err.__class__.__name__ == expected
    assert marker_msg in str(err)
    # subtypes ARE ExecutionError: existing handlers keep working
    assert isinstance(err, ExecutionError)
    assert isinstance(err, getattr(pkg, expected))


def test_subtype_marker_order_resource_beats_storage():
    msg = "java.lang.OutOfMemoryError while reading java.io.FileNotFoundException: x"
    from datafusion_distributed_experiment_spark import ResourceError

    assert isinstance(map_exception(RuntimeError(msg)), ResourceError)


def test_missing_parquet_path_is_storage_error(spark, tmp_path):
    """Live end-to-end: a read of a nonexistent path must surface as the
    StorageError variant with the path in the message."""
    from datafusion_distributed_experiment_spark import StorageError

    with pytest.raises(Exception) as exc:
        spark.read.parquet(str(tmp_path / "never_written.parquet")).collect()
    err = map_exception(exc.value)
    assert isinstance(err, StorageError), err
    assert "never_written" in str(err)


def test_corrupt_parquet_is_data_format_error(spark, tmp_path):
    """Live end-to-end: junk bytes under a .parquet name classify as the
    DataFormatError variant (the reference's ParquetError case)."""
    from datafusion_distributed_experiment_spark import DataFormatError

    bad_dir = tmp_path / "corrupt.parquet"
    bad_dir.mkdir()
    (bad_dir / "part-00000.parquet").write_bytes(b"these are not parquet bytes")
    with pytest.raises(Exception) as exc:
        spark.read.parquet(str(bad_dir)).collect()
    err = map_exception(exc.value)
    assert isinstance(err, DataFormatError), str(err)[:300]


# ------------------------------------------------------------------ #
# Subtype WIRE tests (round-8 verdict task): one integration test per
# ExecutionError subtype where the failure is raised INSIDE an executor
# task and crosses the task->driver boundary before classification —
# the Spark analog of the reference's per-variant network round-trip
# (src/errors/datafusion_error.rs:282-405). The driver-side classifier
# must land the shipped failure in the right variant WITH the original
# message intact.
# ------------------------------------------------------------------ #


def test_wire_deleted_file_is_storage_error(spark, tmp_path):
    """StorageError across the boundary: plan against a valid file index,
    delete the part file underneath, re-execute — the SCAN TASK (not the
    driver's listing) hits FileNotFoundException and ships it back."""
    import glob
    import os

    from datafusion_distributed_experiment_spark import StorageError

    path = str(tmp_path / "vanishing.parquet")
    spark.range(100).coalesce(1).write.parquet(path)
    df = spark.read.parquet(path)
    assert df.count() == 100  # file index + first healthy read
    for part in glob.glob(os.path.join(path, "*.parquet")):
        os.remove(part)
    with pytest.raises(Exception) as exc:
        df.collect()  # cached index still lists the file; the task opens it
    err = map_exception(exc.value)
    assert isinstance(err, StorageError), str(err)[:300]
    assert "vanishing" in str(err)


def test_wire_type_conflict_is_schema_mismatch_error(spark, tmp_path):
    """SchemaMismatchError across the boundary: parquet written as DOUBLE,
    read with a declared INT schema — the declared schema means the driver
    never probes footers, so the conversion failure is raised by the
    vectorized reader inside the scan task."""
    from datafusion_distributed_experiment_spark import SchemaMismatchError

    path = str(tmp_path / "typed.parquet")
    spark.range(50).selectExpr("CAST(id AS DOUBLE) AS x").write.parquet(path)
    with pytest.raises(Exception) as exc:
        spark.read.schema("x INT").parquet(path).collect()
    err = map_exception(exc.value)
    assert isinstance(err, SchemaMismatchError), str(err)[:300]
    assert "x" in str(err) and "typed" in str(err)


def test_wire_corrupt_footer_is_data_format_error(spark, tmp_path):
    """DataFormatError across the boundary: junk bytes under a .parquet
    name, with an EXPLICIT read schema so driver-side footer inference is
    skipped and the footer failure happens in the scan task itself."""
    from datafusion_distributed_experiment_spark import DataFormatError

    bad_dir = tmp_path / "corrupt_remote.parquet"
    bad_dir.mkdir()
    (bad_dir / "part-00000.parquet").write_bytes(b"PAR0 these bytes lie")
    with pytest.raises(Exception) as exc:
        spark.read.schema("x BIGINT").parquet(str(bad_dir)).collect()
    err = map_exception(exc.value)
    assert isinstance(err, DataFormatError), str(err)[:300]


def test_wire_worker_memory_exhaustion_is_resource_error(spark):
    """ResourceError across the boundary: a Python worker that fails to
    allocate raises MemoryError inside the task; the traceback ships back
    through the Arrow boundary and must classify as the resource variant
    with the allocation message intact. (A real heap OOM would take the
    shared test JVM down with it — the worker-side MemoryError is the
    boundary-faithful simulation.)"""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    from datafusion_distributed_experiment_spark import ResourceError

    @F.udf(returnType=LongType())
    def alloc(x):
        raise MemoryError("simulated 64 GiB allocation failure: 424242-marker")

    with pytest.raises(Exception) as exc:
        spark.range(10).select(alloc("id")).collect()
    err = map_exception(exc.value)
    assert isinstance(err, ResourceError), str(err)[:300]
    assert "424242-marker" in str(err)
