"""datafusion_distributed_experiment_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference library ``gabotechs/datafusion-distributed-experiment`` (distributed
DataFusion over Arrow Flight), re-expressed Spark-first:

- The reference's distribution machinery (stages, shuffles, plan shipping,
  worker sessions, error transport — reference ``src/plan/arrow_flight_read.rs:25``,
  ``src/flight_service/do_get.rs:85-188``) is provided natively by Spark's
  DAGScheduler / ShuffleExchangeExec / task serialization, so this package
  exposes *configuration and introspection* of that machinery rather than a
  re-implementation.
- The reference's query surface (TPC-H q1-q22 class SQL executed through
  DataFusion — reference ``tests/tpch.rs:168-194``) is served by Spark SQL /
  Catalyst through :class:`Engine`.
- Beyond the reference, large-scale training-data-pipeline operators
  (deduplication, similarity search, text analysis, multimodal columns) are
  provided under :mod:`.operators` and :mod:`.functions`.

Everything is designed for 100 TB-scale clusters and merely *tested* on
``local[N]``: no collect-to-driver in any operator, broadcast hints on
dimension tables only, AQE on by default, deterministic hash functions that
are reproducible across engines.
"""

from .engine import Engine
from .errors import (
    DataFormatError,
    EngineError,
    ExecutionError,
    PlanningError,
    ResourceError,
    SchemaMismatchError,
    StorageError,
    map_exception,
)
from .session import build_session, default_spark_conf

__version__ = "0.1.0"

__all__ = [
    "Engine",
    "EngineError",
    "PlanningError",
    "ExecutionError",
    "StorageError",
    "SchemaMismatchError",
    "DataFormatError",
    "ResourceError",
    "map_exception",
    "build_session",
    "default_spark_conf",
    "__version__",
]
