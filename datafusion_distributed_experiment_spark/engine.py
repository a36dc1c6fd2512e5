"""Engine — session + catalog + SQL entry point.

Mirrors the reference's lifecycle (register tables -> SQL -> optimized plan ->
staged distributed execution -> collect; reference ``tests/tpch.rs:137-194``)
with an idiomatic Spark API. Registration paths map one-to-one:

- parquet listing table (reference ``tests/tpch.rs:149-161``)      -> :meth:`Engine.register_parquet`
- csv / pipe-delimited ``.tbl`` (reference ``benchmarks/src/tpch/run.rs:294-309``)
                                                                   -> :meth:`Engine.register_csv` / :meth:`Engine.register_tbl`
- ``MemTable::load`` N-way in-memory (reference ``run.rs:226-235``) -> :meth:`Engine.register_mem`
- ``CREATE VIEW``/multi-statement scripts (reference ``run.rs:186-199``,
  ``benchmarks/src/tpch/mod.rs:148-161``)                          -> :meth:`Engine.sql_script`
"""

from __future__ import annotations

import re
from typing import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from . import sources
from .errors import map_exception
from .session import build_session, configure_session

_TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def split_sql_script(script: str) -> list[str]:
    """Split a multi-statement SQL script on ``;`` (reference
    ``benchmarks/src/tpch/mod.rs:148-161``). Separator detection tracks
    single-quoted strings (with both ``''`` and backslash escapes —
    Spark's default string parsing honors backslashes), double-quoted
    tokens (string literals on Spark, identifiers on DuckDB — a ``;``
    inside is part of the token either way), ``--`` line comments, and
    ``/* */`` block comments; empty statements dropped.

    ASSUMPTION: scripts target Spark's DEFAULT string semantics. Under
    ANSI literal mode (``spark.sql.parser.escapedStringLiterals=true``,
    or DuckDB-authored scripts) a literal ending in a backslash like
    ``SELECT 'C:\\';`` would swallow the following ``;`` and merge two
    statements — gate the backslash rule on the parser conf if scripts
    ever target that mode."""
    statements: list[str] = []
    buf: list[str] = []
    quote: str | None = None  # the active quote char, ' or "
    i = 0
    n = len(script)
    while i < n:
        ch = script[i]
        if quote is None and ch == "-" and i + 1 < n and script[i + 1] == "-":
            # -- comment: copy to end of line verbatim
            j = script.find("\n", i)
            j = n if j == -1 else j
            buf.append(script[i:j])
            i = j
            continue
        if quote is None and ch == "/" and i + 1 < n and script[i + 1] == "*":
            # /* block comment */: copy verbatim (unterminated -> to EOF)
            j = script.find("*/", i + 2)
            j = n if j == -1 else j + 2
            buf.append(script[i:j])
            i = j
            continue
        if quote is not None and ch == "\\" and i + 1 < n:
            # backslash escape inside a literal: \' must not close it
            buf.append(script[i : i + 2])
            i += 2
            continue
        if ch in ("'", '"'):
            if quote == ch:
                # doubled quote is an escaped quote inside the token
                if i + 1 < n and script[i + 1] == ch:
                    buf.append(ch * 2)
                    i += 2
                    continue
                quote = None
            elif quote is None:
                quote = ch
            buf.append(ch)
        elif ch == ";" and quote is None:
            stmt = "".join(buf).strip()
            if stmt:
                statements.append(stmt)
            buf = []
        else:
            buf.append(ch)
        i += 1
    tail = "".join(buf).strip()
    if tail:
        statements.append(tail)
    return statements


def _is_query_statement(stmt: str) -> bool:
    """True for statements whose DataFrame is a RESULT (SELECT/WITH/VALUES/
    TABLE), as opposed to commands that also return columned frames
    (SET/SHOW/DESCRIBE/EXPLAIN) — ``sql_script``'s default-result rule.
    Leading comments are skipped with the same scanner rules as the
    splitter (a ``-- note`` above the SELECT must not hide it), and so are
    leading ``(`` — ``(SELECT 1) UNION (SELECT 2)`` is a set-operation
    query whose first keyword sits inside parentheses."""
    i, n = 0, len(stmt)
    while i < n:
        if stmt[i].isspace() or stmt[i] == "(":
            i += 1
        elif stmt[i] == "-" and i + 1 < n and stmt[i + 1] == "-":
            j = stmt.find("\n", i)
            i = n if j == -1 else j + 1
        elif stmt[i] == "/" and i + 1 < n and stmt[i + 1] == "*":
            j = stmt.find("*/", i + 2)
            i = n if j == -1 else j + 2
        else:
            break
    head = stmt[i : i + 8].upper()
    return any(head.startswith(k) for k in ("SELECT", "WITH", "VALUES", "TABLE"))


class Engine:
    """Thin, idiomatic wrapper over a SparkSession.

    ``partitions`` maps the reference's ``target_partitions``
    (reference ``src/test_utils/localhost.rs:41``) to
    ``spark.sql.shuffle.partitions``. Everything else — stage creation, URL
    assignment, plan shipping, shuffle write dedup — is Spark's scheduler
    (reference equivalents: ``src/plan/assign_stages.rs``,
    ``src/flight_service/stream_partitioner_registry.rs``).
    """

    def __init__(
        self,
        spark: SparkSession | None = None,
        partitions: int | None = None,
        app_name: str = "datafusion-distributed-experiment-spark",
    ):
        if spark is None:
            spark = build_session(app_name=app_name, shuffle_partitions=partitions)
        else:
            # The reference's SessionBuilder contract applies to sessions it is
            # *given*, not only ones it builds (reference
            # src/flight_service/session_builder.rs:9-111): an externally
            # constructed SparkSession must still get the engine's runtime
            # confs (nanosAsLong, UTC, ANSI-off, broadcast threshold, ...) or
            # parquet reads and oracle comparisons diverge.
            configure_session(spark, shuffle_partitions=partitions)
        self.spark = spark

    # ------------------------------------------------------------------ #
    # catalog registration (reference SessionBuilder + register_* paths)
    # ------------------------------------------------------------------ #

    def register_parquet(self, name: str, path: str) -> DataFrame:
        """Register a parquet file/directory as a temp view with inferred
        schema (reference ``ctx.register_parquet``,
        ``src/test_utils/parquet.rs:5-17``; listing tables
        ``tests/tpch.rs:149-161``).

        Nanosecond-timestamp columns are converted to TIMESTAMP_NTZ
        (see :func:`..sources.read_parquet_table`)."""
        df = sources.read_parquet_table(self.spark, path)
        df.createOrReplaceTempView(name)
        return df

    def register_csv(
        self,
        name: str,
        path: str,
        schema: StructType | str | None = None,
        sep: str = ",",
        header: bool = True,
    ) -> DataFrame:
        """Register a CSV table, optionally with an explicit schema
        (reference ``benchmarks/src/tpch/run.rs:294-309``)."""
        df = sources.read_csv_table(self.spark, path, schema=schema, sep=sep, header=header)
        df.createOrReplaceTempView(name)
        return df

    def register_json(
        self, name: str, path: str, schema: StructType | str | None = None
    ) -> DataFrame:
        """Register a newline-delimited JSON table (beyond the reference's
        parquet/CSV/mem surface; schema recommended — see
        :func:`..sources.read_json_table`)."""
        df = sources.read_json_table(self.spark, path, schema=schema)
        df.createOrReplaceTempView(name)
        return df

    def register_orc(self, name: str, path: str) -> DataFrame:
        """Register an ORC table (columnar source beyond the reference's
        parquet/CSV/mem surface; same pushdown machinery as parquet)."""
        df = sources.read_orc_table(self.spark, path)
        df.createOrReplaceTempView(name)
        return df

    def register_tbl(
        self, name: str, path: str, schema: StructType | str, strict: bool = True
    ) -> DataFrame:
        """Register a TPC-H ``.tbl`` file: ``|``-delimited, no header, with a
        trailing ``|`` producing a placeholder column that is dropped
        (reference ``benchmarks/src/tpch/mod.rs:41-45``,
        ``convert.rs:97-106``). ``strict`` (default) raises on malformed
        rows instead of silently nulling them — see
        :func:`..sources.read_tbl_table`."""
        df = sources.read_tbl_table(self.spark, path, schema, strict=strict)
        df.createOrReplaceTempView(name)
        return df

    def register_mem(self, name: str, df: DataFrame, partitions: int | None = None) -> DataFrame:
        """Materialize a DataFrame in memory N-ways and register it
        (reference ``MemTable::load``, ``benchmarks/src/tpch/run.rs:226-235``)."""
        df = sources.memory_table(df, partitions=partitions)
        df.createOrReplaceTempView(name)
        return df

    def register_view(self, name: str, df: DataFrame) -> DataFrame:
        df.createOrReplaceTempView(name)
        return df

    def register_sf_dir(
        self, sf_dir: str, tables: Iterable[str] = _TPCH_TABLES
    ) -> dict[str, Exception]:
        """Register every driver-provided synthetic table under ``sf_dir``.

        Fault-isolated per table: one unreadable file must not poison queries
        over the other nine tables. Returns ``{table: exception}`` for any
        failures; callers that need a table hard-fail when they query it."""
        failures: dict[str, Exception] = {}
        for t in tables:
            try:
                self.register_parquet(t, f"{sf_dir}/{t}.parquet")
            except Exception as exc:  # noqa: BLE001 - isolate per table
                failures[t] = exc
        return failures

    # ------------------------------------------------------------------ #
    # query entry points (reference ctx.sql / multi-statement scripts)
    # ------------------------------------------------------------------ #

    def sql(self, text: str) -> DataFrame:
        """Parse/plan a single SQL statement (reference ``ctx.sql``,
        ``tests/tpch.rs:175``). Catalyst optimizes and inserts exchanges —
        the engine adds no hand-scheduling."""
        try:
            return self.spark.sql(text)
        except Exception as exc:  # noqa: BLE001 - mapped into taxonomy
            raise map_exception(exc) from exc

    def sql_script(self, script: str, result_statement: int | None = None) -> DataFrame | None:
        """Execute a ``;``-separated script, returning one statement's result.

        Mirrors the reference's 3-statement q15 handling (``create view;
        select; drop view`` — reference ``benchmarks/src/tpch/run.rs:186-199``):
        by default the result is the last ``SELECT``-producing statement
        before any trailing DDL; pass ``result_statement`` to pick explicitly.
        """
        statements = split_sql_script(script)
        result: DataFrame | None = None
        results: list[DataFrame | None] = []
        for stmt in statements:
            df = self.sql(stmt)
            results.append(df)
            if df is not None and df.columns and _is_query_statement(stmt):
                # _is_query_statement, not "has columns": commands like
                # SET/SHOW/DESCRIBE also return columned frames, and a
                # trailing SET would otherwise overwrite the query result
                result = df
        if result_statement is not None:
            # Safe to return lazily even after a later DROP VIEW: Spark
            # resolves views eagerly at DataFrame creation, so the picked
            # statement's plan no longer references the catalog entry.
            return results[result_statement]
        return result

    def table(self, name: str) -> DataFrame:
        return self.spark.table(name)

    # ------------------------------------------------------------------ #
    # sinks (reference benchmarks/src/tpch/convert.rs:128-160)
    # ------------------------------------------------------------------ #

    def write_parquet(
        self,
        df: DataFrame,
        path: str,
        compression: str = "zstd",
        partition_by: list[str] | None = None,
    ) -> None:
        sources.write_parquet(df, path, compression=compression, partition_by=partition_by)

    def write_clustered(
        self,
        df: DataFrame,
        path: str,
        cluster_by: list[str],
        partitions: int | None = None,
        compression: str = "zstd",
    ) -> None:
        """Range-clustered parquet layout for min/max data skipping on a
        high-cardinality dimension (see :func:`sources.write_clustered`)."""
        sources.write_clustered(
            df, path, cluster_by, partitions=partitions, compression=compression
        )

    def write_bucketed(
        self,
        df: DataFrame,
        name: str,
        path: str,
        bucket_cols: list[str],
        n_buckets: int = 32,
        sort_cols: list[str] | None = None,
    ) -> DataFrame:
        """Write ``df`` as a bucketed (hash-partitioned-on-disk) parquet table
        and register it in the catalog.

        Bucketing is the persistent form of the reference's hash
        ``RepartitionExec`` (reference
        ``src/flight_service/stream_partitioner_registry.rs:19-33``): the
        shuffle is paid ONCE at write time, and every later equi-join or
        aggregation on ``bucket_cols`` between tables bucketed the same way
        runs with ZERO exchanges — the decisive optimization for fact-fact
        joins repeated across a 100 TB pipeline (e.g. lineitem⋈orders every
        night). Both tables must share the bucket column set and bucket
        count; keep ``n_buckets`` >= cluster parallelism.

        The input is pre-repartitioned with ``HashPartitioning(bucket_cols,
        n_buckets)`` — the EXACT bucket-id function (``pmod(murmur3, n)``)
        the bucketed writer applies — so every task holds exactly one
        bucket and writes exactly one file (optimization round 14, guide
        §6 small files: without it every input task writes a sliver into
        every bucket, n_tasks x n_buckets files — measured 650 files for a
        2000-row index at sf0.1, taxing the write, every bucket-pruned
        read, and the oracle's glob; the ``_write_base_index`` hive-layout
        twin measured 10.7 s -> 6.0 s from the same fix)."""
        from pyspark.sql import functions as F

        writer = (
            df.repartition(n_buckets, *[F.col(c) for c in bucket_cols])
            .write.mode("overwrite")
            .format("parquet")
            .bucketBy(n_buckets, *bucket_cols)
            .sortBy(*(sort_cols or bucket_cols))
            .option("path", path)
        )
        writer.saveAsTable(name)
        return self.spark.table(name)

    def write_csv(self, df: DataFrame, path: str, sep: str = ",", header: bool = True) -> None:
        sources.write_csv(df, path, sep=sep, header=header)

    def write_orc(self, df: DataFrame, path: str, compression: str = "zstd") -> None:
        sources.write_orc(df, path, compression=compression)

    def overwrite_partitions(
        self, df: DataFrame, path: str, partition_by: list[str], compression: str = "zstd"
    ) -> None:
        """Replace only the hive partitions present in ``df`` (dynamic
        partition overwrite) — the incremental daily-reingest primitive."""
        sources.overwrite_partitions(df, path, partition_by, compression=compression)

    def register_evolving(self, name: str, path: str) -> DataFrame:
        """Register a schema-evolving parquet directory (files with
        different but compatible schemas) as one unioned-schema view; old
        files surface newly-added columns as NULLs
        (see :func:`sources.read_evolving_table`)."""
        df = sources.read_evolving_table(self.spark, path)
        df.createOrReplaceTempView(name)
        return df

    def compact(
        self, path: str, target_bytes: int = 128 * 1024 * 1024, compression: str = "zstd"
    ) -> tuple[int, int]:
        """Small-file compaction with verify-then-swap semantics
        (see :func:`sources.compact_parquet`)."""
        return sources.compact_parquet(
            self.spark, path, target_bytes=target_bytes, compression=compression
        )

    def check_constraints(self, df: DataFrame, rules: dict[str, str]) -> dict[str, int]:
        """Data-quality rule evaluation in ONE aggregate pass: for each
        ``name -> SQL predicate``, the number of rows where the predicate is
        not TRUE (FALSE **or NULL** both count as violations — the strict
        data-quality reading, NOT SQL CHECK semantics where NULL passes;
        append ``OR col IS NULL`` to a rule to allow missing values).

        One job, one scan, regardless of rule count — every rule is a
        conditional-sum aggregate over the same pass, which is the only
        shape that holds up when the table is 100 TB and the rule set grows
        to dozens."""
        from pyspark.sql import functions as F

        if not rules:
            return {}  # df.agg() with zero exprs is an error, not a no-op
        aggs = [
            # coalesce: SUM over ZERO rows is NULL, and int(None) would
            # crash on an empty (or fully-filtered) frame — zero violations
            F.coalesce(
                F.sum(
                    F.when(
                        F.coalesce(F.expr(pred).cast("boolean"), F.lit(False)), 0
                    ).otherwise(1)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias(name)
            for name, pred in rules.items()
        ]
        row = df.agg(*aggs).collect()[0]
        return {name: int(row[name]) for name in rules}

    def stop(self) -> None:
        self.spark.stop()
