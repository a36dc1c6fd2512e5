"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The query surface mirrors the reference's (TPC-H q1-q22 class SQL, reference
``tests/tpch.rs:168-194`` + ad-hoc aggregation/CTE tests,
``tests/distributed_aggregation.rs:19``, ``tests/distributed_repartitions.rs:18-37``)
plus the training-data pipeline operators. SQL-corpus queries share one ANSI
text between Spark and the DuckDB oracle; DataFrame-native operators carry a
semantically-equivalent hand-written oracle.

All 118 queries are declared as of round 8 (the three round-7 staged
operators — ``bpe_apply``, ``hll_distinct``, ``weighted_sample`` — were
promoted at the round-8 rotation, emptying the staged tier). The staged
machinery (``operators.staged_queries()`` / ``staged_oracles()`` +
``tests/test_staged_oracle.py`` + ``scripts/verify_staged.py``) stays in
place for future operators; round 8 deliberately adds none (the
118-query surface already cycles the 50-slot gate window every 3 rounds —
see ``query_tiers``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import sys as _sys

if "/root/repo" not in _sys.path:  # driver may exec this file from anywhere
    _sys.path.insert(0, "/root/repo")

from datafusion_distributed_experiment_spark import Engine
from datafusion_distributed_experiment_spark import queries as corpus

_SQL_QUERIES = [
    # events_window_funcs was a round-7 stale-budget sacrifice (last green
    # r05) and re-enters the round-8 window with the rest of that cohort
    "adhoc/events_window_funcs",
    *(f"tpch/q{i}" for i in range(1, 23)),
    "adhoc/events_agg_count",
    "adhoc/events_cte_join",
    "adhoc/events_daily",
    "adhoc/events_rolling",
    "adhoc/events_topk",
    "adhoc/events_rollup",
    "adhoc/events_cube",
    "adhoc/events_setops",
    "adhoc/events_median",
    "adhoc/events_latest",
    "adhoc/q1_decimal",
]


_registered: set[tuple[int, str, str]] = set()


def _ensure_registered(spark: SparkSession, sf_dir: str) -> Engine:
    """Register the sf_dir tables once per (session, dir, table) — schema
    probing and view creation are driver-side overhead worth paying a single
    time. Memoized per TABLE so a transient failure on one file is retried
    without masking the other nine, and a half-registered catalog can't be
    mistaken for a complete one."""
    eng = Engine(spark)
    from datafusion_distributed_experiment_spark.engine import _TPCH_TABLES

    pending = [t for t in _TPCH_TABLES if (id(spark), sf_dir, t) not in _registered]
    if pending:
        failures = eng.register_sf_dir(sf_dir, tables=pending)
        for t in pending:
            if t not in failures:
                _registered.add((id(spark), sf_dir, t))
    return eng


def _run_corpus(name: str) -> Callable[[SparkSession, str], DataFrame]:
    text = corpus.load(name)

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _ensure_registered(spark, sf_dir).sql(text)

    return run


def _run_q15_script() -> Callable[[SparkSession, str], DataFrame]:
    """q15 executes the reference's real 3-statement form (create view;
    select; drop view — reference benchmarks/src/tpch/run.rs:186-199) through
    Engine.sql_script; the oracle compares against the CTE rewrite."""
    script = corpus.load("tpch/q15_script")

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _ensure_registered(spark, sf_dir).sql_script(script, result_statement=1)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H q1 shape) on /root/testdata/sf0.001."""
    return _run_corpus("tpch/q1")(spark, "/root/testdata/sf0.001")


def preload_mem(spark: SparkSession, sf_dir: str, partitions: int | None = None) -> None:
    """Reference ``--mem-table`` analog (benchmarks/src/tpch/run.rs:226-235):
    materialize every table in memory N-ways and pin the registration, so
    SQL-corpus queries read the cached MemTable instead of parquet.
    DataFrame-native operator queries read parquet by path and are unaffected
    — same scope as the reference flag, which only feeds its SQL benchmark."""
    from datafusion_distributed_experiment_spark.engine import _TPCH_TABLES
    from datafusion_distributed_experiment_spark.sources.tables import (
        read_parquet_table,
    )

    eng = Engine(spark)
    for t in _TPCH_TABLES:
        eng.register_mem(
            t, read_parquet_table(spark, f"{sf_dir}/{t}.parquet"), partitions=partitions
        )
        _registered.add((id(spark), sf_dir, t))


def query_tiers() -> list[tuple[str, dict[str, Callable[[SparkSession, str], DataFrame]]]]:
    """Queries grouped by tier, gate-ordered: the driver oracle-checks the
    FIRST 50 entries, so the window rotates round-over-round.

    STALE BUDGET (restated for the 118-query surface): 118 queries over a
    50-slot window means the full surface cycles every ceil(118/50) = 3
    rounds — the old "no query goes more than two rounds stale" wording is
    arithmetically impossible in steady state (118/50 = 2.36). The real
    guarantee, pinned by tests/test_corpus_oracle.py: (a) never-verified
    count = 0 — every declared query holds a green row in SOME committed
    CORRECTNESS_r*.json before it may sit outside the window; (b) every
    query outside the window was green within the TWO most recent committed
    artifacts, i.e. at most ~2 completed rounds stale at commit time; (c)
    the queries left to age furthest are chosen deepest-evidence-first.

    ROUND 8 — the window (50):
    * slots 1-3: the promoted round-7 staged operators (bpe_apply,
      hll_distinct, weighted_sample — never driver-checked, lead).
    * slots 4-18: the 15 queries whose last green row is CORRECTNESS_r05
      (the round-7 sacrifice cohort — two rounds stale, must not reach
      three): ann_ivf, ann_lsh, embedding_dedup, embedding_topk,
      media_features, media_frames, media_meta_stats, minhash_dedup_pairs,
      ngram_jaccard_pairs, simhash_dedup_pairs, simhash_signatures,
      dedup_clusters, dedup_incremental, split_assign, events_window_funcs.
    * slots 19-50: 32 of the 50 r06-green queries, shallowest evidence
      first: the five single-green (chunk_overlap, ngram_span_dedup,
      minhash_pairs_skew, kmeans_lloyd_t3, semantic_dedup), the ten
      twice-green (events_asof, events_kmv_distinct, events_range_join,
      sessionize, user_sessions, stream_click_attr, stream_dedup,
      stream_enrich, stream_sliding, events_cube), then 17 of the 4x/5x-
      green SQL corpus — all 10 remaining ad-hoc queries plus the 8
      TPC-H queries with the most distinctive constructs (q15's
      multi-statement script, q1_decimal's decimal promotion, q2's nested
      correlated subquery, q13's outer-join count, q17/q20's correlated
      scalar subqueries, q21/q22's EXISTS/NOT-EXISTS + NOT-IN).

    SACRIFICED this round (18, deepest-evidence-first; they re-enter at
    round 9): the three 5x-green text ops (fingerprint, lang_id,
    text_stats) and the fifteen 4x-green plain-shape TPC-H queries (q1,
    q3-q12, q14, q16, q18, q19) — single-text SQL shared verbatim with the
    oracle, whose join/agg constructs all recur in the in-window eight.
    The 50 r07-green queries sit behind the window as the freshest cohort.

    The bench re-orders tiers for measurement isolation ("streaming"-named
    tiers run last); see ``operators.pipeline_tiers``."""
    sql: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in _SQL_QUERIES:
        sql[name.split("/", 1)[1]] = _run_corpus(name)
    sql["q15"] = _run_q15_script()  # exercise the multi-statement machinery

    from datafusion_distributed_experiment_spark.operators import pipeline_tiers

    by_name: dict[str, dict[str, Callable[[SparkSession, str], DataFrame]]] = dict(
        pipeline_tiers()
    )

    def _pop(tier: str, *names: str) -> dict[str, Callable[[SparkSession, str], DataFrame]]:
        return {n: by_name[tier].pop(n) for n in names}

    def _pop_sql(*names: str) -> dict[str, Callable[[SparkSession, str], DataFrame]]:
        return {n: sql.pop(n) for n in names}

    # --- window slots 1-3: the promoted round-7 staged operators -------
    promoted = {
        **_pop("bpe", "bpe_apply"),
        **_pop("sketches", "hll_distinct"),
        **_pop("curation", "weighted_sample"),
    }
    # --- slots 4-18: last green r05, two rounds stale, must re-verify --
    stale_r05 = {
        **_pop("similarity", "ann_ivf", "ann_lsh", "embedding_dedup", "embedding_topk"),
        **_pop("multimodal", "media_features", "media_frames", "media_meta_stats"),
        **_pop(
            "dedup",
            "minhash_dedup_pairs",
            "ngram_jaccard_pairs",
            "simhash_dedup_pairs",
            "simhash_signatures",
            "dedup_clusters",
            "dedup_incremental",
        ),
        **_pop("curation", "split_assign"),
        **_pop_sql("events_window_funcs"),
    }
    # --- slots 19-23: r06-green with a single green row -----------------
    shallow_r06 = {
        **_pop("dedup", "chunk_overlap", "ngram_span_dedup", "minhash_pairs_skew"),
        **_pop("selection", "kmeans_lloyd_t3"),
        **_pop("similarity", "semantic_dedup"),
    }
    # --- slots 24-28: r06-green, twice green (batch) ---------------------
    mid_r06 = {
        **_pop("temporal", "events_asof", "events_kmv_distinct", "events_range_join"),
        **_pop("stateful", "sessionize", "user_sessions"),
    }
    # --- slots 29-32: r06-green streaming; "streaming"-named tier so the
    # bench still measures them last (RocksDB maintenance-thread isolation)
    streaming_window = _pop(
        "streaming", "stream_click_attr", "stream_dedup", "stream_enrich", "stream_sliding"
    )
    # --- slots 33-50: the in-window SQL cohort (see docstring) ----------
    sql_window = _pop_sql(
        "events_cube",
        "events_agg_count",
        "events_cte_join",
        "events_daily",
        "events_latest",
        "events_median",
        "events_rolling",
        "events_rollup",
        "events_setops",
        "events_topk",
        "q15",
        "q1_decimal",
        "q2",
        "q13",
        "q17",
        "q20",
        "q21",
        "q22",
    )
    # `sql` now holds the 15 sacrificed plain-shape TPC-H queries
    window_tiers = ()
    tail_tiers = (
        "selection",
        "dedup",
        "similarity",
        "multimodal",
        "curation",
        "joins",
        "cdc",
        "profile",
        "analytics",
        "graph",
        "retrieval",
        "bpe",
        "sketches",
        "custom",
        "pipeline",
        "temporal",
        "streaming",
        "stateful",
        "text",
    )
    out = [
        ("promoted", promoted),
        ("stale-r05", stale_r05),
        ("shallow-r06", shallow_r06),
        ("mid-r06", mid_r06),
        ("streaming-window", streaming_window),
        ("sql-window", sql_window),
        # ---- window boundary: exactly 50 entries above this line ----
        ("sql", sql),
        *[(n, by_name[n]) for n in window_tiers],
        *[(n, by_name[n]) for n in tail_tiers],
    ]
    return [(n, qs) for n, qs in out if qs]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for _, tier in query_tiers():
        out.update(tier)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for name in _SQL_QUERIES:
        out[name.split("/", 1)[1]] = corpus.strip_hints(corpus.load(name))

    from datafusion_distributed_experiment_spark.operators import pipeline_oracles

    out.update(pipeline_oracles())
    return out
