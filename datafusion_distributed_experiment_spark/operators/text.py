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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    DUCK_ASCII_LOWER,
    DUCK_POLY_HASH,
    DUCK_TOKENS,
    ascii_lower,
    poly_hash,
    tokens,
)

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import rebalance_narrow_scan

    # Single-row-group file; fan the HOF-heavy map stages out to all cores.
    # NULL text coalesces to '' (round-13 review, mirrored in every oracle
    # text reference): size(tokens(NULL)) is -1 with ANSI off and
    # poly_hash(NULL) folds NULL-vs-0 across engines — a NULL document
    # behaves as an EMPTY one (zero counts, empty-string fingerprint).
    path = f"{sf_dir}/documents.parquet"
    return rebalance_narrow_scan(spark.read.parquet(path), path).withColumn(
        "text", F.coalesce(F.col("text"), F.lit(""))
    )


def stats_frame(docs: DataFrame, extra: dict[str, Column] | None = None) -> DataFrame:
    """Frame-level form of :func:`text_stats`: (doc_id, text) -> the quality
    feature block. Reused by the end-to-end pipeline over arbitrary corpora
    (e.g. the dedup-augmented corpus).

    ``extra`` columns (computed from ``text``) are evaluated in the first
    projection and carried through — how :func:`features_frame` fuses the
    token-count block into the SAME scan instead of a second scan + join.

    Frame-level NULL-text-as-empty guarantee (round-13): callers may pass
    arbitrary corpora (the pipeline's dedup-augmented frame), so the
    coalesce is applied HERE too, not only in the module reader — the
    shared stats_body_sql oracle spelling coalesces identically."""
    extra = extra or {}
    docs = docs.withColumn("text", F.coalesce(F.col("text"), F.lit("")))
    staged = (
        docs
        .select(
            F.col("doc_id"),
            F.length("text").cast("long").alias("n_chars"),
            F.length(F.regexp_replace(F.col("text"), " ", "")).cast("long").alias("compact_len"),
            tokens(F.col("text")).alias("toks"),
            *[c.alias(name) for name, c in extra.items()],
        )
        .select(
            F.col("doc_id"),
            F.col("n_chars"),
            F.col("compact_len"),
            F.size("toks").cast("long").alias("n_tokens"),
            F.size(F.array_distinct("toks")).cast("long").alias("n_distinct_tokens"),
            # ascii_lower(t): capitalized stopwords ('The', 'In', 'A') must
            # count — matching lowercase STOPWORDS against raw tokens
            # undercounted density on mixed-case text in BOTH spellings
            # (round-12 review). ASCII translate, not lower(): JVM full case
            # mapping lowers 'İN' to 'i̇n' (no match) where DuckDB's simple
            # mapping yields 'in' (match) — engine-neutral fold required
            # (round-13 review; STOPWORDS are pure ASCII)
            F.size(F.filter("toks", lambda t: ascii_lower(t).isin(*STOPWORDS))).cast("long").alias("stop_hits"),
            *extra,
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
        *extra,
    )


def features_frame(docs: DataFrame) -> DataFrame:
    """stats_frame ∪ token_frame columns in ONE projection chain over one
    scan — the fused form the corpus pipeline consumes, so a 100 TB corpus
    is read once (the separate-frames-then-join form would scan twice and
    shuffle both sides on doc_id). ``n_ws_tokens`` ≡ ``n_tokens``; only the
    regex counters are genuinely new work."""
    return stats_frame(docs, extra=_token_counters(F.col("text"))).withColumn(
        "n_ws_tokens", F.col("n_tokens")
    )


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token/char counts, lexical diversity, mean token length, stopword
    density — the quality-scoring feature block.

    Staged selects: higher-order-function chains (split/filter) sit outside
    whole-stage codegen, so they get no common-subexpression elimination — a
    single flat select would re-tokenize the document for every derived
    column. Aliasing ``toks`` in its own projection pins one evaluation
    (CollapseProject keeps multi-use non-trivial aliases un-inlined)."""
    return stats_frame(_docs(spark, sf_dir)).orderBy("doc_id")


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
            # ascii_lower(t): the stats_frame stopword-case contract
            F.size(F.filter("toks", lambda t: ascii_lower(t).isin(*STOPWORDS))).cast("long").alias("stop_hits"),
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
# CASE-EXPLICIT classes over the RAW text (round-12 review): the previous
# lower(text) pre-pass diverged between engines on special-cased characters
# (JVM full case mapping turns U+0130 'İ' into 2 codepoints, utf8proc's
# simple mapping into 1), and explicit [sS]-style classes avoid regex
# case-folding semantics (RE2's (?i) folds Unicode — 'ſ' would match 's' —
# where Java's default (?i) is ASCII-only). Probed bit-identical on both
# engines over mixed-case, accented, special-cased, and astral inputs.
BPE_PATTERN = (
    r"'(?:[sS]|[tT]|[rR][eE]|[vV][eE]|[mM]|[lL][lL]|[dD])"
    r"|[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \t\n\r\f]"
)


def _token_counters(text: Column) -> dict[str, Column]:
    """The three regex counter expressions shared by :func:`token_frame`
    and :func:`features_frame` — one spelling, so the fused pipeline path
    and the standalone query cannot drift from each other or from their
    common DuckDB oracle body. Counts run over the RAW text with
    case-explicit patterns (see BPE_PATTERN). regexp_count, not
    size(regexp_extract_all(...)): counting stays in the regex engine with
    zero array materialization per row."""
    return {
        "n_bpe_tokens": F.regexp_count(text, F.lit(BPE_PATTERN)).cast("long"),
        "n_word_runs": F.regexp_count(text, F.lit(r"[a-zA-Z]+")).cast("long"),
        "n_digit_runs": F.regexp_count(text, F.lit(r"[0-9]+")).cast("long"),
    }


def token_frame(docs: DataFrame) -> DataFrame:
    """Frame-level form of :func:`token_count`: (doc_id, text) -> counts.
    Carries the stats_frame NULL-text-as-empty guarantee."""
    docs = docs.withColumn("text", F.coalesce(F.col("text"), F.lit("")))
    counters = _token_counters(F.col("text"))
    return docs.select(
        F.col("doc_id"),
        F.size(tokens(F.col("text"))).cast("long").alias("n_ws_tokens"),
        *[expr.alias(name) for name, expr in counters.items()],
    )


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace tokens and a BPE-ish regex
    pre-tokenization (the 'how many LLM tokens is this corpus' estimator).
    Map-only, JVM-side regex — no Python in the loop."""
    return token_frame(_docs(spark, sf_dir)).orderBy("doc_id")


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


# Quality-filter thresholds (Gopher/C4-style heuristic band checks). Each
# passing check contributes QUALITY_WEIGHT ppm; documents keep when the total
# clears QUALITY_KEEP_PPM. All integer ppm arithmetic — exact cross-engine.
QUALITY_MIN_TOKENS = 10
QUALITY_MAX_TOKENS = 5000
QUALITY_STOP_MIN_PPM = 10_000
QUALITY_STOP_MAX_PPM = 600_000
QUALITY_DIVERSITY_MIN_PPM = 300_000
QUALITY_MEAN_CHARS_MIN_PPM = 2_000_000
QUALITY_MEAN_CHARS_MAX_PPM = 15_000_000
QUALITY_WEIGHT = 250_000
QUALITY_KEEP_PPM = 750_000


def quality_frame(st: DataFrame, keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """Frame-level quality scoring over a stats_frame output. ``keep_cols``
    are projected through unchanged (lets fused-feature callers keep their
    counters without re-joining on doc_id)."""
    n_tokens = F.col("n_tokens")
    checks = [
        n_tokens.between(QUALITY_MIN_TOKENS, QUALITY_MAX_TOKENS),
        F.col("stopword_ppm").between(QUALITY_STOP_MIN_PPM, QUALITY_STOP_MAX_PPM),
        (F.floor(F.lit(1e6) * F.col("n_distinct_tokens") / n_tokens) >= QUALITY_DIVERSITY_MIN_PPM),
        F.col("mean_token_chars_ppm").between(
            QUALITY_MEAN_CHARS_MIN_PPM, QUALITY_MEAN_CHARS_MAX_PPM
        ),
    ]
    score = None
    for c in checks:
        term = F.when(c, F.lit(QUALITY_WEIGHT)).otherwise(F.lit(0))
        score = term if score is None else score + term
    return st.select(
        "doc_id",
        score.cast("long").alias("quality_ppm"),
        (score >= QUALITY_KEEP_PPM).alias("keep"),
        *keep_cols,
    )


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite document-quality score: four Gopher/C4-style band checks
    (token count, stopword density, lexical diversity, mean token length),
    each worth QUALITY_WEIGHT ppm, plus the keep/drop verdict a training-data
    pipeline filters on. Map-only over the text_stats feature block — at
    100 TB this is the same single scan; the verdict column makes the
    downstream filter a pushed-down boolean predicate."""
    return quality_frame(stats_frame(_docs(spark, sf_dir))).orderBy("doc_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "text_stats": text_stats,
        "lang_id": lang_id,
        "fingerprint": fingerprint,
        "token_count": token_count,
        "quality_score": quality_score,
    }


_STOP_LT = DUCK_ASCII_LOWER.format(x="t")
_STOP_SQL = " OR ".join(f"{_STOP_LT} = '{w}'" for w in STOPWORDS)
# COALESCE mirrors _docs' NULL-text-as-empty contract
_TOKS = DUCK_TOKENS.format(x="COALESCE(text, '')")


def stats_body_sql(src: str = "documents") -> str:
    """DuckDB spelling of stats_frame over table/CTE ``src``."""
    return f"""
            SELECT
                doc_id,
                CAST(length(COALESCE(text, '')) AS BIGINT) AS n_chars,
                CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
                CAST(len(list_distinct({_TOKS})) AS BIGINT) AS n_distinct_tokens,
                CAST(FLOOR(1e6 * length(replace(COALESCE(text, ''), ' ', '')) / len({_TOKS})) AS BIGINT) AS mean_token_chars_ppm,
                CAST(FLOOR(1e6 * len(list_filter({_TOKS}, t -> {_STOP_SQL})) / len({_TOKS})) AS BIGINT) AS stopword_ppm
            FROM {src}"""


def token_body_sql(src: str = "documents") -> str:
    """DuckDB spelling of token_frame over table/CTE ``src``."""
    return f"""
            SELECT
                doc_id,
                CAST(len({_TOKS}) AS BIGINT) AS n_ws_tokens,
                CAST(len(regexp_extract_all(COALESCE(text, ''), '{BPE_PATTERN.replace("'", "''")}')) AS BIGINT) AS n_bpe_tokens,
                CAST(len(regexp_extract_all(COALESCE(text, ''), '[a-zA-Z]+')) AS BIGINT) AS n_word_runs,
                CAST(len(regexp_extract_all(COALESCE(text, ''), '[0-9]+')) AS BIGINT) AS n_digit_runs
            FROM {src}"""


_STATS_BODY = stats_body_sql()

_QUALITY_SCORE_SQL = " + ".join(
    f"(CASE WHEN {cond} THEN {QUALITY_WEIGHT} ELSE 0 END)"
    for cond in (
        f"n_tokens BETWEEN {QUALITY_MIN_TOKENS} AND {QUALITY_MAX_TOKENS}",
        f"stopword_ppm BETWEEN {QUALITY_STOP_MIN_PPM} AND {QUALITY_STOP_MAX_PPM}",
        f"FLOOR(1e6 * n_distinct_tokens / n_tokens) >= {QUALITY_DIVERSITY_MIN_PPM}",
        f"mean_token_chars_ppm BETWEEN {QUALITY_MEAN_CHARS_MIN_PPM} AND {QUALITY_MEAN_CHARS_MAX_PPM}",
    )
)


def oracles() -> dict[str, str]:
    return {
        "text_stats": f"""{_STATS_BODY} ORDER BY doc_id
        """,
        "quality_score": f"""
            WITH stats AS ({_STATS_BODY})
            SELECT doc_id,
                   CAST({_QUALITY_SCORE_SQL} AS BIGINT) AS quality_ppm,
                   ({_QUALITY_SCORE_SQL}) >= {QUALITY_KEEP_PPM} AS keep
            FROM stats ORDER BY doc_id
        """,
        "lang_id": f"""
            SELECT
                doc_id,
                CAST(len(list_filter({_TOKS}, t -> {_STOP_SQL})) AS BIGINT) AS stop_hits,
                CASE WHEN 1e6 * len(list_filter({_TOKS}, t -> {_STOP_SQL})) / len({_TOKS}) >= 20000
                     THEN 'en' ELSE 'unk' END AS lang_pred
            FROM documents ORDER BY doc_id
        """,
        "token_count": f"""{token_body_sql()} ORDER BY doc_id
        """,
        "fingerprint": f"""
            SELECT
                doc_id,
                {DUCK_POLY_HASH.format(x="COALESCE(text, '')")} AS fp_full,
                {DUCK_POLY_HASH.format(x="substring(COALESCE(text, ''), 1, 64)")} AS fp_prefix64
            FROM documents ORDER BY doc_id
        """,
    }
