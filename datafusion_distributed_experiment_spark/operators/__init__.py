"""Training-data pipeline operators (beyond the reference's own surface).

The reference demonstrates an extension mechanism for shipping custom
operators to workers (reference ``tests/custom_extension_codec.rs:160-264``);
in Spark the analogous extension point is DataFrame compositions and
Arrow-batched pandas UDFs, which PySpark serializes and ships natively. Each
operator here is built for 100 TB scale: no driver-side collection, shuffle
only on explicit keys, broadcast only for provably-small sides.

``pipeline_queries()`` / ``pipeline_oracles()`` export the driver-facing
(spark, sf_dir) -> DataFrame callables and their DuckDB oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def pipeline_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ..streaming import events as streaming_events
    from ..streaming import stateful
    from . import curation, dedup, multimodal, pipeline, similarity, temporal, text

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(text.queries())
    out.update(dedup.queries())
    out.update(similarity.queries())
    out.update(multimodal.queries())
    out.update(stateful.queries())
    out.update(pipeline.queries())
    out.update(temporal.queries())
    out.update(curation.queries())
    # Streaming LAST: each micro-batch query leaves RocksDB state-store
    # maintenance threads and checkpoint cleanup running for a while after it
    # stops, which measurably contaminates the next few *batch* query timings
    # in a sequential bench (observed 0.7s -> 5-8s on the text tier when the
    # streaming tier preceded it). Order is a bench-stability concern only —
    # correctness runs each entry independently.
    out.update(streaming_events.queries())
    return out


def pipeline_oracles() -> dict[str, str]:
    from ..streaming import events as streaming_events
    from ..streaming import stateful
    from . import curation, dedup, multimodal, pipeline, similarity, temporal, text

    out: dict[str, str] = {}
    out.update(streaming_events.oracles())
    out.update(text.oracles())
    out.update(dedup.oracles())
    out.update(similarity.oracles())
    out.update(multimodal.oracles())
    out.update(stateful.oracles())
    out.update(pipeline.oracles())
    out.update(temporal.oracles())
    out.update(curation.oracles())
    return out
