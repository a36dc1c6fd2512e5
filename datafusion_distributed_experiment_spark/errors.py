"""Typed error taxonomy preserving original messages.

The reference round-trips the full ``DataFusionError`` taxonomy through
``tonic::Status`` so a remote failure surfaces to the client as the original
error (reference ``src/errors/mod.rs:17-45``,
``src/errors/datafusion_error.rs:86-254``). Spark already propagates executor
exceptions to the driver; this module maps the wrapped Py4J/Spark exceptions
into a small, stable Python taxonomy that keeps the original message intact
(asserted by tests/test_errors.py, mirroring reference
``tests/error_propagation.rs:27-69``).
"""

from __future__ import annotations


class EngineError(Exception):
    """Base class; ``original`` keeps the untouched underlying exception."""

    def __init__(self, message: str, original: BaseException | None = None):
        super().__init__(message)
        self.original = original


class PlanningError(EngineError):
    """SQL parse / analysis failures (reference: ``DataFusionError::SQL`` /
    ``Plan`` variants, ``src/errors/datafusion_error.rs``)."""


class ExecutionError(EngineError):
    """Runtime failures, including ones raised on executors and shipped back
    to the driver (reference: ``DataFusionError::Execution`` + the tonic
    transport, ``src/errors/mod.rs:17-45``)."""


class StorageError(ExecutionError):
    """Missing/unreadable files and paths — the reference's
    ``DataFusionError::ObjectStore`` / ``IoError`` variants
    (``src/errors/datafusion_error.rs:98-105``)."""


class SchemaMismatchError(ExecutionError):
    """Runtime schema conflicts (a parquet column whose physical type
    cannot convert to the requested read schema, merge-schema conflicts) —
    the reference's ``DataFusionError::SchemaError``
    (``src/errors/datafusion_error.rs:126-128``)."""


class DataFormatError(ExecutionError):
    """Corrupt or undecodable Arrow/Parquet bytes — the reference's
    ``DataFusionError::ArrowError`` / ``ParquetError`` variants
    (``src/errors/datafusion_error.rs:88-97``)."""


class ResourceError(ExecutionError):
    """Memory/result-size exhaustion — the reference's
    ``DataFusionError::ResourcesExhausted``
    (``src/errors/datafusion_error.rs``, round-trip test cases at
    ``:282-405``)."""


# Ordered markers: FIRST match classifies (resource before storage — an OOM
# while reading a file mentions both; schema before data-format — Spark's
# "Parquet column cannot be converted" names parquet but is a schema
# conflict, not corrupt bytes). Message-based because the JVM exception
# class rarely survives the Py4J wrap intact; the markers are the stable
# Spark error-class names plus the underlying Java exception names.
_SUBTYPE_MARKERS: list[tuple[type[ExecutionError], tuple[str, ...]]] = [
    (
        ResourceError,
        (
            # "MemoryError" also matches the JVM's "OutOfMemoryError" (as a
            # substring) AND a Python worker's MemoryError traceback — both
            # sides of the Arrow boundary land in the resource variant
            "MemoryError",
            "Total size of serialized results",
            "exceeds memory limit",
            "RESOURCES_EXHAUSTED",
            "Not enough memory",
        ),
    ),
    (
        StorageError,
        (
            "FileNotFoundException",
            "NoSuchFileException",
            "PATH_NOT_FOUND",
            "Path does not exist",
            "FILE_NOT_EXIST",
            "AccessDeniedException",
        ),
    ),
    (
        SchemaMismatchError,
        (
            "PARQUET_COLUMN_DATA_TYPE_MISMATCH",
            "Parquet column cannot be converted",
            "Failed to merge incompatible data types",
            "SCHEMA_MISMATCH",
            "incompatible schema",
        ),
    ),
    (
        DataFormatError,
        (
            "not a Parquet file",
            "CANNOT_READ_FILE_FOOTER",
            "Could not read footer",
            "ArrowInvalid",
            "Error reading Arrow",
            "malformed",
            "corrupted",
        ),
    ),
]


def _execution_subtype(msg: str) -> type[ExecutionError]:
    for cls, markers in _SUBTYPE_MARKERS:
        if any(m in msg for m in markers):
            return cls
    return ExecutionError


def map_exception(exc: BaseException) -> EngineError:
    """Map a raw PySpark exception to the engine taxonomy.

    Keeps the complete original message (the reference's tests assert the
    exact error text crosses the network boundary, reference
    ``tests/error_propagation.rs:63-66``); the taxonomy only adds a type.
    """
    try:
        from pyspark.errors import (  # pyspark >= 3.4
            AnalysisException,
            ParseException,
            PySparkException,
        )
    except ImportError:  # pragma: no cover - very old pyspark
        AnalysisException = ParseException = PySparkException = ()  # type: ignore

    msg = str(exc)
    if isinstance(exc, (ParseException, AnalysisException)):
        # Spark reports a missing input PATH as an analysis failure; the
        # reference files the same condition under ObjectStore/IoError, not
        # Plan (src/errors/datafusion_error.rs:98-105) — storage markers win
        # over the planning default so the variant matches the cause.
        sub = _execution_subtype(msg)
        if sub is StorageError:
            return StorageError(msg, original=exc)
        return PlanningError(msg, original=exc)
    if isinstance(exc, PySparkException):
        return _execution_subtype(msg)(msg, original=exc)
    # Py4J errors wrap the JVM stack; keep everything (callers may match on
    # the embedded original message, e.g. a failing UDF's text).
    if exc.__class__.__name__ == "Py4JJavaError":
        return _execution_subtype(msg)(msg, original=exc)
    # Generic branch keeps the COMPLETE message too — the module contract
    # is that callers can match on any embedded text, and truncating to
    # the first non-empty line broke matches on later lines (the other
    # branches never truncated). Leading blank lines are still trimmed.
    return _execution_subtype(msg)(msg.lstrip("\r\n") or msg, original=exc)
