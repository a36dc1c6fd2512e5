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


def _first_meaningful_line(text: str) -> str:
    for line in text.splitlines():
        line = line.strip()
        if line:
            return line
    return text


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
        return PlanningError(msg, original=exc)
    if isinstance(exc, PySparkException):
        return ExecutionError(msg, original=exc)
    # Py4J errors wrap the JVM stack; keep everything (callers may match on
    # the embedded original message, e.g. a failing UDF's text).
    if exc.__class__.__name__ == "Py4JJavaError":
        return ExecutionError(msg, original=exc)
    return ExecutionError(_first_meaningful_line(msg), original=exc)
