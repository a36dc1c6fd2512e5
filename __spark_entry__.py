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

All 123 queries are declared as of round 14 (the round-13 staged operator
``ivf_pq_index_upsert`` was promoted at the round-14 rotation). The
staged tier (``operators.staged_queries()`` / ``staged_oracles()`` +
``tests/test_staged_oracle.py`` + ``scripts/verify_staged.py``) holds at
most the one new operator each round's VERDICT budgets; the 123-query
surface cycles the 50-slot gate window every ceil(123/50) = 3 rounds —
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


# WeakKeyDictionary keyed by the LIVE session (not id(spark): ids are
# recycled addresses — the scoped_session/custom-source identity lesson),
# mapping each session to the sf_dir its views CURRENTLY point at plus the
# per-table registration record. Temp views are ONE per-session namespace,
# so a session that switches sf_dirs must re-register everything — the old
# (session, dir, table) memo kept the stale dir's keys and silently served
# the other scale's data to any later call with the first dir.
import weakref

_registered: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _ensure_registered(spark: SparkSession, sf_dir: str) -> Engine:
    """Register the sf_dir tables once per session — schema probing and view
    creation are driver-side overhead worth paying a single time. Memoized
    per TABLE so a transient failure on one file is retried without masking
    the other nine, and a half-registered catalog can't be mistaken for a
    complete one; switching sf_dirs drops the whole record (the views are
    one namespace) and registers the new dir from scratch."""
    eng = Engine(spark)
    from datafusion_distributed_experiment_spark.engine import _TPCH_TABLES

    state = _registered.get(spark)
    if state is None or state[0] != sf_dir:
        state = (sf_dir, set())
        _registered[spark] = state
    done = state[1]
    pending = [t for t in _TPCH_TABLES if t not in done]
    if pending:
        failures = eng.register_sf_dir(sf_dir, tables=pending)
        for t in pending:
            if t not in failures:
                done.add(t)
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
    done: set = set()
    for t in _TPCH_TABLES:
        eng.register_mem(
            t, read_parquet_table(spark, f"{sf_dir}/{t}.parquet"), partitions=partitions
        )
        done.add(t)
    # pin the whole-session record in one shot: the MemTables ARE this
    # sf_dir's views now, so any prior dir's record must not linger
    _registered[spark] = (sf_dir, done)


def query_tiers() -> list[tuple[str, dict[str, Callable[[SparkSession, str], DataFrame]]]]:
    """Queries grouped by tier, gate-ordered: the driver oracle-checks the
    FIRST 50 entries, so the window rotates round-over-round.

    STALE BUDGET (123-query surface): 123 queries over a 50-slot window
    means the full surface cycles every ceil(123/50) = 3 rounds. The real
    guarantee, pinned by tests/test_corpus_oracle.py: (a) never-verified
    count = 0 — every declared query holds a green row in SOME committed
    CORRECTNESS_r*.json before it may sit outside the window; (b) every
    query outside the window was green within the THREE most recent
    committed artifacts (exactly the 3-round cycle arithmetic; holds at
    every commit point, mid-rotation included); (c) the queries left to
    age furthest are chosen deepest-evidence-first.

    ROUND 14 — the window (50):
    * slot 1: ivf_pq_index_upsert — the round-13 staged operator (the
      MAINTAIN step of the persisted IVF-PQ index: encode only the CDC
      delta under the frozen model, rewrite only touched inverted lists,
      serve bit-identically to a frozen-model rebuild), PROMOTED this
      rotation (never driver-verified; leads the window).
    * slots 2-23: the 22 queries whose last green row is CORRECTNESS_r11
      (the round-13 sacrifice cohort — the rotation contract's re-entry
      point): the three alphabetically-last 4x-green (sessionize_native,
      shuffle_shards, token_budget_select), embedding_topk and
      media_features, and the seventeen SQL-corpus re-entries (q2, q13,
      q15, q17, q20, q21, q22, q1_decimal, events_agg_count,
      events_cte_join, events_daily, events_latest, events_median,
      events_rolling, events_rollup, events_setops, events_topk).
    * slots 24-50: the 27 SHALLOWEST of the r12-green queries by total
      green-row depth across all committed artifacts: ivf_pq_topk
      (once-green), domain_token_profile (twice), the three thrice-green
      (bpe_apply, hll_distinct, weighted_sample), and the 22
      alphabetically-first four-times-green (anomaly_days, basket_pairs,
      chunk_overlap, event_sequences, events_json, events_percentiles,
      events_percentiles_hist, events_pivot, events_unpivot,
      events_window_funcs, funnel, kmeans_lloyd_t3, media_resize,
      minhash_pairs_skew, ngram_span_dedup, ngram_top, retention,
      salted_events_enrich, semantic_dedup, split_assign,
      stratified_sample, table_profile — top_terms, the alphabetically
      last, sits out one more round). No streaming queries land in this
      window (the stream_* cohort is r13-green, the freshest tier).

    SACRIFICED this round (23 r12-green, deepest-evidence-first; they
    re-enter at round 15 alongside the shallowest r13-green): top_terms
    (4x), the four 5x-green (events_asof, events_cube,
    events_kmv_distinct, events_range_join), the fifteen 6x-green TPC-H
    (q1, q3-q12, q14, q16, q18, q19), and the three 7x-green
    (fingerprint, lang_id, text_stats). The 50 r13-green queries sit
    behind the window as the freshest cohort.

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

    # --- slot 1: the promoted round-13 staged operator ------------------
    promoted = _pop("similarity", "ivf_pq_index_upsert")
    # --- slots 2-23: last green r11, the round-13 sacrifice cohort ------
    stale_r11 = {
        **_pop("analytics", "sessionize_native"),
        **_pop("curation", "shuffle_shards"),
        **_pop("selection", "token_budget_select"),
        **_pop("similarity", "embedding_topk"),
        **_pop("multimodal", "media_features"),
        **_pop_sql(
            "q2",
            "q13",
            "q15",
            "q17",
            "q20",
            "q21",
            "q22",
            "q1_decimal",
            "events_agg_count",
            "events_cte_join",
            "events_daily",
            "events_latest",
            "events_median",
            "events_rolling",
            "events_rollup",
            "events_setops",
            "events_topk",
        ),
    }
    # --- slots 24-28: r12-green with one to three green rows -------------
    shallow_r12 = {
        **_pop("similarity", "ivf_pq_topk"),
        **_pop("sketches", "domain_token_profile", "hll_distinct"),
        **_pop("bpe", "bpe_apply"),
        **_pop("curation", "weighted_sample"),
    }
    # --- slots 29-50: the 22 alphabetically-first 4x-green r12 -----------
    mid_r12 = {
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
        ),
        **_pop("dedup", "chunk_overlap", "minhash_pairs_skew", "ngram_span_dedup"),
        **_pop_sql("events_window_funcs"),
        **_pop("selection", "kmeans_lloyd_t3"),
        **_pop("multimodal", "media_resize"),
        **_pop("curation", "ngram_top", "split_assign", "stratified_sample"),
        **_pop("joins", "salted_events_enrich"),
        **_pop("similarity", "semantic_dedup"),
        **_pop("profile", "table_profile"),
    }
    # `sql` now holds only the sacrificed SQL cohort (q1, q3-q12, q14,
    # q16, q18, q19, events_cube — all 6x-green, the deepest evidence)
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
        ("stale-r11", stale_r11),
        ("shallow-r12", shallow_r12),
        ("mid-r12", mid_r12),
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
