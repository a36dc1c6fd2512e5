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

Beyond the 115 declared queries (the 10 round-6 staged operators were
promoted at the round-7 rotation), ``operators.staged_queries()`` /
``staged_oracles()`` hold the three round-7 operators (``bpe_apply``,
``hll_distinct``, ``weighted_sample``) that could not take a 50-entry
gate-window slot this round (the window is fully spent on the promotion
plus the rotation): same contract, cross-engine verified by
``tests/test_staged_oracle.py`` on every pytest run, benched and
scale-probed alongside the declared surface, promoted into the window at
the round-8 rotation.
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
    # events_window_funcs' last driver row is CORRECTNESS_r05; it is one of
    # the round-7 stale-budget sacrifices (see query_tiers) and stays in
    # the sql_tail tier behind the window
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
    FIRST 50 entries, so the window rotates round-over-round — no query's
    driver-verified row may go more than ~two rounds stale.

    ROUND 7 — the promotion round. The 10 round-6 staged operators
    (triangle_count, lpa_communities_t3, bfs_hops_t3, bm25_topk,
    dsir_weights, bpe_merges_t2, winnow_fingerprints, span_scrub,
    cms_heavy_hitters, stream_topk) have never been driver-checked and
    LEAD the window; next come the 5 queries whose last green row is
    CORRECTNESS_r04 (dedup_exact, minhash_signatures, token_count,
    quality_score, corpus_pipeline — already two rounds stale, must not
    reach three); the remaining 35 slots go to the r05-verified half.

    STALE BUDGET (115 queries / 50 slots means ~15 per cycle go two
    rounds stale; these are the sacrificed r05-verified queries, chosen
    deepest-evidence-first so the skipped check costs the least):
    the nine 4x-green (ann_ivf, ann_lsh, embedding_dedup, embedding_topk,
    media_features, minhash_dedup_pairs, ngram_jaccard_pairs,
    simhash_dedup_pairs, simhash_signatures), the 3x-green dedup_clusters
    and dedup_incremental, the 2x-green media_frames and media_meta_stats,
    plus events_window_funcs (constructs re-proven by the r06-green SQL
    window queries) and split_assign (trivial map-only hash bucketing whose
    xxhash machinery is shared with in-window stratified_sample and
    shuffle_shards). They re-enter the round-8 window.

    Everything outside the window holds a green row in a committed
    CORRECTNESS_r*.json (invariant pinned by tests/test_corpus_oracle.py).
    The bench re-orders tiers for measurement isolation ("streaming"-named
    tiers run last); see ``operators.pipeline_tiers``."""
    sql: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in _SQL_QUERIES:
        sql[name.split("/", 1)[1]] = _run_corpus(name)
    sql["q15"] = _run_q15_script()  # exercise the multi-statement machinery
    # r05-green; within the round-7 stale budget (see docstring)
    sql_tail = {"events_window_funcs": sql.pop("events_window_funcs")}

    from datafusion_distributed_experiment_spark.operators import pipeline_tiers

    by_name: dict[str, dict[str, Callable[[SparkSession, str], DataFrame]]] = dict(
        pipeline_tiers()
    )

    def _pop(tier: str, *names: str) -> dict[str, Callable[[SparkSession, str], DataFrame]]:
        return {n: by_name[tier].pop(n) for n in names}

    # --- window slots 1-10: the promoted round-6 staged operators ------
    promoted = {
        **_pop("graph", "triangle_count", "lpa_communities_t3", "bfs_hops_t3"),
        **_pop("retrieval", "bm25_topk"),
        **_pop("selection", "dsir_weights"),
        **_pop("bpe", "bpe_merges_t2"),
        **_pop("dedup", "winnow_fingerprints", "span_scrub"),
        **_pop("sketches", "cms_heavy_hitters"),
    }
    # stream_topk keeps a "streaming"-named tier so the bench still
    # measures it last (RocksDB maintenance-thread isolation)
    streaming_promoted = _pop("streaming", "stream_topk")
    # --- slots 11-15: last green r04, two rounds stale, must re-verify --
    stale_r04 = {
        **_pop("dedup", "dedup_exact", "minhash_signatures"),
        **_pop("text", "token_count", "quality_score"),
        **_pop("pipeline", "corpus_pipeline"),
    }
    # --- the 14 sacrificed operator queries (see docstring) ------------
    deep_tail = {
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
    }
    # --- r06-verified (freshest evidence): behind the window -----------
    fresh_r06 = {
        **_pop("selection", "kmeans_lloyd_t3"),
        **_pop("dedup", "minhash_pairs_skew", "chunk_overlap", "ngram_span_dedup"),
        **_pop("similarity", "semantic_dedup"),
    }
    # slots 16-50: the r05-verified half rotating back in (35 queries)
    window_tiers = (
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
        "custom",
    )
    tail_tiers = ("temporal", "streaming", "stateful", "text")
    out = [
        ("promoted", promoted),
        ("streaming-promoted", streaming_promoted),
        ("stale-r04", stale_r04),
        *[(n, by_name[n]) for n in window_tiers],
        # ---- window boundary: exactly 50 entries above this line ----
        ("sql", sql),
        ("sql_tail", sql_tail),
        *[(n, by_name[n]) for n in tail_tiers],
        ("fresh-r06", fresh_r06),
        ("deep-tail", deep_tail),
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
