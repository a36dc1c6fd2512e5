"""bm25_topk edge semantics beyond the cross-engine oracle check: the
documented empty-corpus precondition (NULL-vacuous scoring branch), the
int64 score-headroom guard, and query-set construction corners."""

from __future__ import annotations

import pytest

from datafusion_distributed_experiment_spark.errors import PlanningError
from datafusion_distributed_experiment_spark.operators.retrieval import (
    B_X,
    K1_X,
    bm25_topk,
    check_score_headroom,
)


def _write_docs(spark, tmp_path, rows):
    sf_dir = str(tmp_path / "sf")
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.parquet(
        f"{sf_dir}/documents.parquet"
    )
    return sf_dir


def test_empty_corpus_is_vacuous_not_wrong(spark, tmp_path):
    """All-empty texts -> zero tokens -> no postings, no query terms: the
    documented precondition (total_toks > 0) fails VACUOUSLY — an empty,
    correctly-shaped result, never a crash or a NULL-scored row."""
    sf_dir = _write_docs(
        spark, tmp_path, [(1, ""), (2, "   "), (3, "")]
    )
    out = bm25_topk(spark, sf_dir)
    assert out.columns == ["query_id", "rank", "doc_id", "score_x", "n_terms_hit"]
    assert out.count() == 0


def test_no_query_docs_yields_empty_topk(spark, tmp_path):
    """A corpus where no doc_id hashes into the query set produces postings
    but zero query terms — empty result through the broadcast-restriction
    path (doc_id 2's hash % 101 != 0)."""
    sf_dir = _write_docs(spark, tmp_path, [(2, "alpha beta gamma")])
    assert bm25_topk(spark, sf_dir).count() == 0


def test_headroom_guard_passes_realistic_scales():
    # 1e9 docs, tf 1000, dl 100k tokens: inside the documented bound
    check_score_headroom(1_000_000_000, 1_000, 100_000)


@pytest.mark.parametrize(
    "n_docs,max_tf,max_dl",
    [
        # numerator bound: N * tf > i64 / (667 * (K1_X + 1000))
        (1_000_000_000, 2**63 // (667 * (K1_X + 1000)), 10),
        # length-norm bound: N * dl > i64 / B_X
        (1_000_000_000, 10, 2**63 // B_X),
    ],
)
def test_headroom_guard_trips_on_pathological_scales(n_docs, max_tf, max_dl):
    with pytest.raises(PlanningError, match="int64 headroom"):
        check_score_headroom(n_docs, max_tf, max_dl)
