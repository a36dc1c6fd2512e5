"""Round-13 adversarial hardening of the curation tier: NULL-text
documents and token-less documents. Pre-fix behavior on a corpus carrying
NULL / empty / whitespace-only / astral / NULL-source rows:

- ``domain_mix`` / ``domain_resample`` / ``pack_sequences`` /
  ``repetition_stats``: Spark's ``size(tokens(NULL))`` is **-1** with
  ANSI off, so a NULL document SUBTRACTED a token from corpus totals
  where DuckDB's ``len(NULL)`` is NULL (skipped by SUM) — silent
  cross-engine hash divergence in every ppm share;
- ``pii_scrub``: ``poly_hash(NULL)`` folded NULL on Spark vs 0 on
  DuckDB; additionally its ``lower(text)`` pre-pass carried the JVM
  full-case-mapping divergence ('İ' lowers to two codepoints on Spark,
  one under utf8proc) into ``redacted_fp``;
- ``ngram_top``: a token-less document's whole-document fallback shingle
  is ``''`` on Spark but NULL under the DuckDB spelling — the top-N list
  disagreed on the gram VALUE.

The contract now: NULL text coalesces to '' at the module reader (the
zero-default accounting doctrine — the document row stays, contributes
zero tokens), mirrored in every oracle text reference; PII folding uses
the engine-neutral ASCII translate; empty n-grams are excluded from
top-N identically on both engines.
"""

from __future__ import annotations

import duckdb
import pytest

from datafusion_distributed_experiment_spark.operators import bpe as B
from datafusion_distributed_experiment_spark.operators import curation as C
from datafusion_distributed_experiment_spark.operators import retrieval as R

from ._compare import assert_frames_match

OPS = sorted(set(C.queries()) | {"bpe_apply", "bpe_merges_t2", "bm25_topk"})


@pytest.fixture(scope="module")
def adversarial_docs_dir(spark, tmp_path_factory):
    """150 documents (enough that bm25's 1%-of-corpus query-doc hash rule
    selects at least one query) with NULL text, empty text,
    whitespace-only text + NULL lang, astral text, and a long doc with a
    NULL source — every row class that previously diverged."""
    d = tmp_path_factory.mktemp("adversarial_docs")
    rows = []
    for i in range(150):
        txt = f"alpha beta gamma doc{i % 7} " + (
            "lorem ipsum dolor sit amet " * (i % 4 + 1)
        )
        rows.append((i, txt, "en" if i % 3 else "de", f"src{i % 4}", len(txt)))
    rows[3] = (3, None, "en", "src0", None)
    rows[5] = (5, "", "en", "src1", 0)
    rows[6] = (6, "   ", None, "src2", 3)
    rows[8] = (8, "emoji \U0001f600\U0001f40d astral \U0001d518 İSTANBUL", "en", "src3", 30)
    rows[9] = (9, "x " * 3000, "en", None, 6000)
    rows[11] = (11, "mail ADMIN@EXAMPLE.COM and İN 12345 here", "en", "src3", 40)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{d}/documents.parquet")
    return str(d)


def _conn(adversarial_docs_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{adversarial_docs_dir}/documents.parquet/*.parquet'"
    )
    return con


@pytest.mark.parametrize("name", OPS)
def test_curation_tier_agrees_on_adversarial_documents(
    name, spark, adversarial_docs_dir
):
    qs = {**C.queries(), **B.queries(), **R.queries()}
    os_ = {**C.oracles(), **B.oracles(), **R.oracles()}
    sdf = qs[name](spark, adversarial_docs_dir).toPandas()
    assert len(sdf) > 0, f"{name}: empty result proves nothing"
    odf = _conn(adversarial_docs_dir).execute(os_[name]).df()
    assert_frames_match(sdf, odf, name)


def test_null_text_contributes_zero_not_minus_one(spark, adversarial_docs_dir):
    """The size(NULL) = -1 footgun, pinned at the output level: the NULL
    document's row SURVIVES with zero token mass (accounting kept), and
    per-source totals are sums of the non-NULL docs only."""
    rep = (
        C.queries()["repetition_stats"](spark, adversarial_docs_dir)
        .toPandas()
        .set_index("doc_id")
    )
    assert int(rep.loc[3, "n_tokens"]) == 0, "NULL text must count 0 tokens, not -1"
    assert int(rep.loc[3, "n_uniq_tokens"]) == 0
    assert int(rep.loc[5, "n_tokens"]) == 0

    mix = C.queries()["domain_mix"](spark, adversarial_docs_dir).toPandas()
    assert int(mix["src_tokens"].min()) >= 0, "no negative token masses"


def test_pii_fold_is_engine_neutral(spark, adversarial_docs_dir):
    """'ADMIN@EXAMPLE.COM' must be detected (ASCII fold lowers it); the
    'İ' in the same doc must NOT be case-mapped (the JVM two-codepoint
    lowering that diverged from utf8proc)."""
    pii = (
        C.queries()["pii_scrub"](spark, adversarial_docs_dir)
        .toPandas()
        .set_index("doc_id")
    )
    assert int(pii.loc[11, "n_emails"]) == 1
    assert int(pii.loc[11, "n_longnums"]) == 1
    assert int(pii.loc[3, "redacted_fp"]) == 0, "NULL text folds as empty"


def test_ngram_top_has_no_empty_grams(spark, adversarial_docs_dir):
    top = C.queries()["ngram_top"](spark, adversarial_docs_dir).toPandas()
    assert (top["ngram"].str.len() > 0).all()
    assert top["ngram"].notna().all()


def test_multimodal_tier_agrees_on_adversarial_documents(spark, adversarial_docs_dir):
    """Round-13: the synthetic-media synthesis coalesces NULL text to ''
    on both engines — a NULL payload previously made Spark emit a
    zero-feature row while the oracle's md5(NULL) collapsed to NULL,
    hash-diverging media_features. All five multimodal ops must agree on
    the NULL-bearing corpus (which also carries the negative-doc_id
    modality case from the r12 CASE-spelling fix)."""
    from datafusion_distributed_experiment_spark.operators import multimodal as M

    con = _conn(adversarial_docs_dir)
    for name in sorted(M.queries()):
        if name not in M.oracles():
            continue
        sdf = M.queries()[name](spark, adversarial_docs_dir).toPandas()
        assert len(sdf) > 0, f"{name}: empty result proves nothing"
        odf = con.execute(M.oracles()[name]).df()
        assert_frames_match(sdf, odf, name)
