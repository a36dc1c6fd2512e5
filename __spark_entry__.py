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

All 119 queries are declared as of round 10 (the round-9 staged operator
``domain_token_profile`` was promoted at the round-10 rotation). The staged
tier (``operators.staged_queries()`` / ``staged_oracles()`` +
``tests/test_staged_oracle.py`` + ``scripts/verify_staged.py``) holds at
most the one new operator each round's VERDICT budgets; the 119-query
surface cycles the 50-slot gate window every ceil(119/50) = 3 rounds —
see ``query_tiers``.
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

    STALE BUDGET (119-query surface): 119 queries over a 50-slot window
    means the full surface cycles every ceil(119/50) = 3 rounds. The real
    guarantee, pinned by tests/test_corpus_oracle.py: (a) never-verified
    count = 0 — every declared query holds a green row in SOME committed
    CORRECTNESS_r*.json before it may sit outside the window; (b) every
    query outside the window was green within the THREE most recent
    committed artifacts (exactly the 3-round cycle arithmetic; holds at
    every commit point, mid-rotation included); (c) the queries left to
    age furthest are chosen deepest-evidence-first.

    ROUND 10 — the window (50):
    * slot 1: domain_token_profile — the round-9 staged operator,
      PROMOTED this rotation (never driver-verified; leads the window).
    * slots 2-19: the 18 queries whose last green row is CORRECTNESS_r07
      (the round-9 sacrifice cohort — the rotation contract's re-entry
      point): quality_score, dedup_exact, minhash_signatures,
      token_count, and the 14 map-only analytics shapes (anomaly_days,
      basket_pairs, event_sequences, events_json, events_percentiles,
      events_percentiles_hist, events_pivot, events_unpivot, funnel,
      retention, salted_events_enrich, top_terms, ngram_top,
      table_profile).
    * slots 20-50: the 31 SHALLOWEST of the 50 r08-green queries by
      total green-row depth across all committed artifacts: the three
      single-green promoted-at-r8 ops (bpe_apply, hll_distinct,
      weighted_sample), the seven twice-green (chunk_overlap,
      events_window_funcs, kmeans_lloyd_t3, minhash_pairs_skew,
      ngram_span_dedup, semantic_dedup, split_assign), the twelve
      thrice-green (events_asof, events_cube, events_kmv_distinct,
      events_range_join, media_frames, media_meta_stats, sessionize,
      user_sessions + the four micro-batch streaming queries in a
      "streaming"-named tier so the bench measures them last), the two
      4x-green CC/incremental dedups (dedup_clusters, dedup_incremental),
      and seven risk-weighted picks from the 5x-green band — the pairs
      miners and ANN ops sharing the round-9-rewritten _with_signature
      fold and the hash-bucketing code paths (minhash_dedup_pairs,
      ngram_jaccard_pairs, simhash_dedup_pairs, simhash_signatures,
      ann_ivf, ann_lsh, embedding_dedup).

    SACRIFICED this round (19, deepest-evidence-first; they re-enter at
    round 11 alongside ~31 of the 50 r09-green): all 5x-green, lowest
    risk — the nine ad-hoc SQL aggregates (events_agg_count,
    events_cte_join, events_daily, events_latest, events_median,
    events_rolling, events_rollup, events_setops, events_topk), the
    seven plain-shape TPC-H re-runs (q2, q13, q15, q17, q20, q21, q22),
    q1_decimal, and the two battle-tested ops embedding_topk and
    media_features. The 50 r09-green queries sit behind the window as
    the freshest cohort.

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

    # --- slot 1: the promoted round-9 staged operator -------------------
    promoted = _pop("sketches", "domain_token_profile")
    # --- slots 2-19: last green r07, the round-9 sacrifice cohort -------
    stale_r07 = {
        **_pop("text", "quality_score", "token_count"),
        **_pop("dedup", "dedup_exact", "minhash_signatures"),
        **_pop("curation", "ngram_top"),
        **_pop("joins", "salted_events_enrich"),
        **_pop("profile", "table_profile"),
        **_pop(
            "analytics",
            "anomaly_days",
            "basket_pairs",
            "event_sequences",
            "events_json",
            "events_percentiles",
            "events_percentiles_hist",
            "events_pivot",
            "events_unpivot",
            "funnel",
            "retention",
            "top_terms",
        ),
    }
    # --- slots 20-29: r08-green with one or two green rows --------------
    shallow_r08 = {
        **_pop("bpe", "bpe_apply"),
        **_pop("sketches", "hll_distinct"),
        **_pop("curation", "weighted_sample", "split_assign"),
        **_pop("dedup", "chunk_overlap", "ngram_span_dedup", "minhash_pairs_skew"),
        **_pop("selection", "kmeans_lloyd_t3"),
        **_pop("similarity", "semantic_dedup"),
        **_pop_sql("events_window_funcs"),
    }
    # --- slots 30-46: r08-green, three/four green rows + the seven
    # risk-weighted 5x-green picks (see docstring) ------------------------
    mid_r08 = {
        **_pop("temporal", "events_asof", "events_kmv_distinct", "events_range_join"),
        **_pop_sql("events_cube"),
        **_pop("multimodal", "media_frames", "media_meta_stats"),
        **_pop("stateful", "sessionize", "user_sessions"),
        **_pop(
            "dedup",
            "dedup_clusters",
            "dedup_incremental",
            "minhash_dedup_pairs",
            "ngram_jaccard_pairs",
            "simhash_dedup_pairs",
            "simhash_signatures",
        ),
        **_pop("similarity", "ann_ivf", "ann_lsh", "embedding_dedup"),
    }
    # --- slots 47-50: r08-green micro-batch streaming; "streaming"-named
    # tier so the bench still measures them last (RocksDB maintenance-
    # thread isolation)
    streaming_window = _pop(
        "streaming", "stream_click_attr", "stream_dedup", "stream_enrich", "stream_sliding"
    )
    # `sql` now holds the sacrificed 5x-green SQL cohort (behind the window)
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
        ("stale-r07", stale_r07),
        ("shallow-r08", shallow_r08),
        ("mid-r08", mid_r08),
        ("streaming-window", streaming_window),
        # ---- window boundary: exactly 50 entries above this line ----
        ("sql", sql),
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
