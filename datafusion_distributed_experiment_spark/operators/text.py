"""Text-analysis operators over the ``documents`` table.

Large-scale training-data pipeline primitives: per-document statistics,
quality signals, language identification, and content fingerprinting. All
implemented as JVM-side expressions (no Python UDFs) — at 100 TB these are
embarrassingly-parallel map-only stages with full columnar pruning (only
``doc_id``/``text`` are read).

Ratios are emitted as ``floor(1e6 * ratio)`` integers (ppm) so cross-engine
comparisons are exact. Each operator has a hand-written DuckDB oracle with
identical integer arithmetic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import DUCK_POLY_HASH, DUCK_TOKENS, poly_hash, tokens

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import rebalance_narrow_scan

    # Single-row-group file; fan the HOF-heavy map stages out to all cores.
    return rebalance_narrow_scan(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token/char counts, lexical diversity, mean token length, stopword
    density — the quality-scoring feature block.

    Staged selects: higher-order-function chains (split/filter) sit outside
    whole-stage codegen, so they get no common-subexpression elimination — a
    single flat select would re-tokenize the document for every derived
    column. Aliasing ``toks`` in its own projection pins one evaluation
    (CollapseProject keeps multi-use non-trivial aliases un-inlined)."""
    staged = (
        _docs(spark, sf_dir)
        .select(
            F.col("doc_id"),
            F.length("text").cast("long").alias("n_chars"),
            F.length(F.regexp_replace(F.col("text"), " ", "")).cast("long").alias("compact_len"),
            tokens(F.col("text")).alias("toks"),
        )
        .select(
            F.col("doc_id"),
            F.col("n_chars"),
            F.col("compact_len"),
            F.size("toks").cast("long").alias("n_tokens"),
            F.size(F.array_distinct("toks")).cast("long").alias("n_distinct_tokens"),
            F.size(F.filter("toks", lambda t: t.isin(*STOPWORDS))).cast("long").alias("stop_hits"),
        )
    )
    n_tokens = F.col("n_tokens")
    return staged.select(
        F.col("doc_id"),
        F.col("n_chars"),
        n_tokens,
        F.col("n_distinct_tokens"),
        F.floor(F.lit(1e6) * F.col("compact_len") / n_tokens).cast("long").alias("mean_token_chars_ppm"),
        F.floor(F.lit(1e6) * F.col("stop_hits") / n_tokens).cast("long").alias("stopword_ppm"),
    ).orderBy("doc_id")


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram/stopword-heuristic language ID: documents whose stopword
    density clears a threshold are tagged 'en', else 'unk'. (The synthetic
    corpus is English-ish word salad; the heuristic — not the stored ``lang``
    column — is what's being verified.)"""
    return (
        _docs(spark, sf_dir)
        # Tokenize ONCE (see text_stats on why staging matters for HOFs).
        .select(F.col("doc_id"), tokens(F.col("text")).alias("toks"))
        .select(
            F.col("doc_id"),
            F.size(F.filter("toks", lambda t: t.isin(*STOPWORDS))).cast("long").alias("stop_hits"),
            F.size("toks").cast("long").alias("n_tokens"),
        )
        .select(
            F.col("doc_id"),
            F.col("stop_hits"),
            F.when(F.lit(1e6) * F.col("stop_hits") / F.col("n_tokens") >= 20000, "en")
            .otherwise("unk")
            .alias("lang_pred"),
        )
        .orderBy("doc_id")
    )


# BPE-ish pre-tokenizer regex (GPT-2 style, simplified to the subset with
# identical semantics in Java regex and RE2 — no lookahead): contractions,
# letter runs, digit runs, single non-space symbols. The whitespace class is
# spelled out because Java's \s includes \x0B while RE2's does not.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)|[a-z]+|[0-9]+|[^a-z0-9 \t\n\r\f]"


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and a BPE-ish regex
    pre-tokenization (the 'how many LLM tokens is this corpus' estimator).
    Map-only, JVM-side regex — no Python in the loop."""
    low = F.lower(F.col("text"))
    # regexp_count, not size(regexp_extract_all(...)): counting stays in the
    # regex engine with zero array materialization per row.
    return (
        _docs(spark, sf_dir)
        .select(
            F.col("doc_id"),
            F.size(tokens(F.col("text"))).cast("long").alias("n_ws_tokens"),
            F.regexp_count(low, F.lit(BPE_PATTERN)).cast("long").alias("n_bpe_tokens"),
            F.regexp_count(low, F.lit(r"[a-z]+")).cast("long").alias("n_word_runs"),
            F.regexp_count(low, F.lit(r"[0-9]+")).cast("long").alias("n_digit_runs"),
        )
        .orderBy("doc_id")
    )


def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic document fingerprints: a full-text rolling hash and a
    64-char-prefix hash (cheap pre-filter for dedup cascades)."""
    return (
        _docs(spark, sf_dir)
        .select(
            F.col("doc_id"),
            poly_hash(F.col("text")).alias("fp_full"),
            poly_hash(F.substring(F.col("text"), 1, 64)).alias("fp_prefix64"),
        )
        .orderBy("doc_id")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "text_stats": text_stats,
        "lang_id": lang_id,
        "fingerprint": fingerprint,
        "token_count": token_count,
    }


_STOP_SQL = " OR ".join(f"t = '{w}'" for w in STOPWORDS)
_TOKS = DUCK_TOKENS.format(x="text")


def oracles() -> dict[str, str]:
    return {
        "text_stats": f"""
            SELECT
                doc_id,
                CAST(length(text) AS BIGINT) AS n_chars,
                CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
                CAST(len(list_distinct({_TOKS})) AS BIGINT) AS n_distinct_tokens,
                CAST(FLOOR(1e6 * length(replace(text, ' ', '')) / len({_TOKS})) AS BIGINT) AS mean_token_chars_ppm,
                CAST(FLOOR(1e6 * len(list_filter({_TOKS}, t -> {_STOP_SQL})) / len({_TOKS})) AS BIGINT) AS stopword_ppm
            FROM documents ORDER BY doc_id
        """,
        "lang_id": f"""
            SELECT
                doc_id,
                CAST(len(list_filter({_TOKS}, t -> {_STOP_SQL})) AS BIGINT) AS stop_hits,
                CASE WHEN 1e6 * len(list_filter({_TOKS}, t -> {_STOP_SQL})) / len({_TOKS}) >= 20000
                     THEN 'en' ELSE 'unk' END AS lang_pred
            FROM documents ORDER BY doc_id
        """,
        "token_count": f"""
            SELECT
                doc_id,
                CAST(len({_TOKS}) AS BIGINT) AS n_ws_tokens,
                CAST(len(regexp_extract_all(lower(text), '{BPE_PATTERN.replace("'", "''")}')) AS BIGINT) AS n_bpe_tokens,
                CAST(len(regexp_extract_all(lower(text), '[a-z]+')) AS BIGINT) AS n_word_runs,
                CAST(len(regexp_extract_all(lower(text), '[0-9]+')) AS BIGINT) AS n_digit_runs
            FROM documents ORDER BY doc_id
        """,
        "fingerprint": f"""
            SELECT
                doc_id,
                {DUCK_POLY_HASH.format(x="text")} AS fp_full,
                {DUCK_POLY_HASH.format(x="substring(text, 1, 64)")} AS fp_prefix64
            FROM documents ORDER BY doc_id
        """,
    }
