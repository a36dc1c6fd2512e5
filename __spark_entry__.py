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
promoted at the round-8 rotation). The staged tier
(``operators.staged_queries()`` / ``staged_oracles()`` +
``tests/test_staged_oracle.py`` + ``scripts/verify_staged.py``) holds the
single round-9 addition ``domain_token_profile`` — the one staged slot the
round-8 VERDICT budgeted — which awaits a gate-window slot at the
round-10 rotation (the 118-query surface already cycles the 50-slot gate
window every 3 rounds — see ``query_tiers``).
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

    ROUND 9 — the window (50):
    * slots 1-18: the 18 queries whose last green row is CORRECTNESS_r06
      (the round-8 sacrifice cohort — two completed rounds stale, the
      rotation contract says they re-enter now): the fifteen TPC-H
      queries q1, q3-q12, q14, q16, q18, q19 and the three text ops
      text_stats, lang_id, fingerprint.
    * slots 19-28: the ten r07-green queries with a SINGLE green row
      (the operators promoted at the round-7 rotation): bfs_hops_t3,
      lpa_communities_t3, triangle_count, bm25_topk, dsir_weights,
      bpe_merges_t2, winnow_fingerprints, span_scrub, cms_heavy_hitters,
      and stream_topk (kept in a "streaming"-named tier so the bench
      still measures it last).
    * slots 29-50: 22 of the 36 twice-green r07 queries. All 36 carry
      equal evidence depth, so the tie-break is risk-weighted: the
      iterative/composed/stateful operators whose silent-regression risk
      is highest take the slots (dedup_clusters_star's CC loop,
      corpus_pipeline's composition, rollup_incremental's IVM path,
      custom_source_scan's codec, cdc_apply_changes, sessionize_native,
      bloom_semi_agg, embedding_quantize, media_dedup, media_resize,
      pagerank_nations, kmeans_assign, token_budget_select, and the nine
      hash-sensitive curation samplers: chunk_documents, decontaminate,
      domain_mix, domain_resample, pack_sequences, pii_scrub,
      repetition_stats, shuffle_shards, stratified_sample).

    SACRIFICED this round (18, deepest-evidence-first; they re-enter at
    round 10): the four deep-evidence ops (quality_score 4x-green;
    dedup_exact, minhash_signatures, token_count 5x-green) and the 14
    map-only/single-exchange analytics shapes among the twice-green
    (anomaly_days, basket_pairs, event_sequences, events_json,
    events_percentiles, events_percentiles_hist, events_pivot,
    events_unpivot, funnel, retention, salted_events_enrich, top_terms,
    ngram_top, table_profile) — the lowest-risk dataflows in the r07
    cohort. The 50 r08-green queries sit behind the window as the
    freshest cohort.

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

    # --- slots 1-15: r06-stale TPC-H re-entries (round-8 sacrifice) ----
    stale_sql = _pop_sql(
        "q1", "q3", "q4", "q5", "q6", "q7", "q8", "q9", "q10", "q11",
        "q12", "q14", "q16", "q18", "q19",
    )
    # --- slots 16-18: r06-stale text ops (round-8 sacrifice) -----------
    stale_text = _pop("text", "text_stats", "lang_id", "fingerprint")
    # --- slots 19-27: promoted-at-r7 single-green (batch) --------------
    shallow_r07 = {
        **_pop("graph", "bfs_hops_t3", "lpa_communities_t3", "triangle_count"),
        **_pop("retrieval", "bm25_topk"),
        **_pop("selection", "dsir_weights"),
        **_pop("bpe", "bpe_merges_t2"),
        **_pop("dedup", "winnow_fingerprints", "span_scrub"),
        **_pop("sketches", "cms_heavy_hitters"),
    }
    # --- slot 28: promoted-at-r7 single-green streaming; "streaming"-
    # named tier so the bench still measures it last (RocksDB
    # maintenance-thread isolation)
    streaming_window = _pop("streaming", "stream_topk")
    # --- slots 29-50: twice-green r07, risk-weighted (see docstring) ---
    mid_r07 = {
        **_pop("dedup", "dedup_clusters_star"),
        **_pop("pipeline", "corpus_pipeline"),
        **_pop("custom", "custom_source_scan"),
        **_pop("cdc", "cdc_apply_changes"),
        **_pop("analytics", "rollup_incremental", "sessionize_native"),
        **_pop("joins", "bloom_semi_agg"),
        **_pop("similarity", "embedding_quantize"),
        **_pop("multimodal", "media_dedup", "media_resize"),
        **_pop("graph", "pagerank_nations"),
        **_pop("selection", "kmeans_assign", "token_budget_select"),
        **_pop(
            "curation",
            "chunk_documents",
            "decontaminate",
            "domain_mix",
            "domain_resample",
            "pack_sequences",
            "pii_scrub",
            "repetition_stats",
            "shuffle_shards",
            "stratified_sample",
        ),
    }
    # `sql` now holds the r08-green SQL cohort (freshest, behind the window)
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
        ("stale-sql", stale_sql),
        ("stale-text", stale_text),
        ("shallow-r07", shallow_r07),
        ("streaming-window", streaming_window),
        ("mid-r07", mid_r07),
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
