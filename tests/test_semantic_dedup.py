"""Semantic dedup (SemDeDup-style): behavior and plan-shape tests.

The oracle equivalence is covered by the corpus differential test
(`tests/test_corpus_oracle.py::test_query_matches_oracle[semantic_dedup]`);
these pin the operator-level contract directly.
"""

from __future__ import annotations

from datafusion_distributed_experiment_spark.operators import similarity
from datafusion_distributed_experiment_spark.plans import plan_string

from .conftest import SF_DIR


def test_semantic_dedup_drops_copies_keeps_originals(spark):
    rows = {r["vec_id"]: r for r in similarity.semantic_dedup(spark, SF_DIR).collect()}
    originals = [v for v in rows if v < similarity.AUG_OFFSET]
    copies = [v for v in rows if v >= similarity.AUG_OFFSET]
    assert copies, "augmentation produced no exact copies"
    # every exact copy is dropped; its original survives, in the SAME cluster
    for v in copies:
        orig = v - similarity.AUG_OFFSET
        assert not rows[v]["is_kept"], f"copy {v} not dropped"
        assert rows[orig]["is_kept"], f"original {orig} wrongly dropped"
        assert rows[v]["cluster"] == rows[orig]["cluster"]
    # the verdict frame covers the whole corpus (nothing silently vanishes)
    assert len(originals) * 10 >= len(copies) * 9  # every 10th original copied
    assert set(originals) == {v - similarity.AUG_OFFSET for v in copies} | set(
        originals
    )


def test_semantic_dedup_join_is_cluster_bounded(spark):
    """The pairwise stage must be an equi-join on the cluster key — never a
    cartesian/broadcast-nested-loop over the corpus. This is the N^1.5
    SemDeDup contract: comparisons confined to ~sqrt(N)-sized clusters."""
    plan = plan_string(similarity.semantic_dedup(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
