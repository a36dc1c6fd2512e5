"""End-to-end training-data pipeline: the flagship composition query.

quality filter -> near-dup pair mining -> duplicate-cluster resolution ->
drop non-canonical members -> token-budget rollup — the standard shape of a
pretraining-corpus build, expressed as ONE declarative plan over the
augmented dedup corpus (where near-duplicates are observable). Every stage
reuses the exact operator kernels verified individually (stats_frame /
quality_frame / token_frame / minhash LSH / connected components), and the
DuckDB oracle is assembled from the same SQL fragments those operators'
oracles use — so the composition cannot drift from its parts.

Scale shape: the filter and token stages are map-only over one corpus scan;
the dedup stages are the LSH band shuffle + pairs-sized label propagation;
the final joins are broadcast-sized (drop set + per-doc rollups keyed on
doc_id). Nothing in the composition adds a shuffle the stages didn't
already have.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .dedup import (
    _DUCK_CORPUS,
    _DUCK_MINHASH_PAIRS,
    _DUCK_SIG,
    _corpus,
    _mine_minhash_pairs,
    connected_components,
)
from .text import (
    _QUALITY_SCORE_SQL,
    QUALITY_KEEP_PPM,
    features_frame,
    quality_frame,
    token_body_sql,
    stats_body_sql,
)


def corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus summary after filtering + dedup: how many documents
    survive, their token budget, and their aggregate quality mass."""
    corpus = _corpus(spark, sf_dir)
    # quality + token features fused into one corpus scan (features_frame);
    # quality_frame carries the token counters through its projection, so
    # the only joins left are against the broadcast-sized drop set.
    feats = quality_frame(
        features_frame(corpus), keep_cols=("n_bpe_tokens", "n_ws_tokens")
    )
    # ordered=False: CC checkpoints the pairs immediately, so the declared
    # pair query's presentation sort would execute its range exchange +
    # sampling pass for rows whose order is then discarded (round 14)
    drop = (
        connected_components(_mine_minhash_pairs(_corpus(spark, sf_dir), ordered=False))
        .filter(F.col("doc_id") != F.col("cluster_id"))
        .select("doc_id")
    )
    kept = feats.filter(F.col("keep")).join(drop, "doc_id", "left_anti")
    return kept.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_bpe_tokens").cast("long").alias("total_bpe_tokens"),
        F.sum("n_ws_tokens").cast("long").alias("total_ws_tokens"),
        F.sum("quality_ppm").cast("long").alias("total_quality_ppm"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {"corpus_pipeline": corpus_pipeline}


def oracles() -> dict[str, str]:
    return {
        "corpus_pipeline": f"""
            WITH RECURSIVE {_DUCK_CORPUS}, {_DUCK_SIG}, {_DUCK_MINHASH_PAIRS}, edges AS (
                SELECT doc_a AS u, doc_b AS v FROM pairs
                UNION
                SELECT doc_b AS u, doc_a AS v FROM pairs
            ), reach(doc_id, r) AS (
                SELECT u, u FROM edges
                UNION
                SELECT reach.doc_id, edges.v FROM reach JOIN edges ON reach.r = edges.u
            ), drop_set AS (
                SELECT doc_id FROM reach GROUP BY doc_id HAVING MIN(r) <> doc_id
            ), stats AS ({stats_body_sql("corpus")}
            ), quality AS (
                SELECT doc_id,
                       CAST({_QUALITY_SCORE_SQL} AS BIGINT) AS quality_ppm,
                       ({_QUALITY_SCORE_SQL}) >= {QUALITY_KEEP_PPM} AS keep
                FROM stats
            ), toks AS ({token_body_sql("corpus")}
            ), kept AS (
                SELECT q.doc_id, q.quality_ppm, t.n_bpe_tokens, t.n_ws_tokens
                FROM quality q
                JOIN toks t ON t.doc_id = q.doc_id
                WHERE q.keep AND q.doc_id NOT IN (SELECT doc_id FROM drop_set)
            )
            SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(n_bpe_tokens) AS BIGINT) AS total_bpe_tokens,
                   CAST(SUM(n_ws_tokens) AS BIGINT) AS total_ws_tokens,
                   CAST(SUM(quality_ppm) AS BIGINT) AS total_quality_ppm
            FROM kept
        """,
    }
