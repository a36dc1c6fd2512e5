"""Audit: every shared-dataflow oracle has an algorithm-level replica.

The cross-engine oracle proves Spark == DuckDB, but when the DuckDB side is
the SAME dataflow unrolled as CTEs (iterative kernels expressed as
WITH RECURSIVE or round-unrolled ``_tN`` CTE chains), a semantic bug in the
shared dataflow passes on BOTH engines. This is a proven failure class, not
a hypothetical: the pairless-BPE-merge bug emptied the vocabulary on both
engines and survived the oracle for two rounds until the pure-Python
replica caught it (operators/bpe.py, round 8).

This module is the round-8 VERDICT's requested audit note made executable:
one table mapping every oracle in the risk class to its replica test (the
function must exist — a renamed or deleted replica fails here) or to a
documented exemption explaining why the oracle is genuinely independent.
New iterative/unrolled operators must be added to the table — the
heuristic sweep below catches the ones that forget.
"""

from __future__ import annotations

import importlib
import re

import __spark_entry__ as entry_mod

# name -> ("replica", test module, test function) | ("exempt", reason)
AUDIT: dict[str, tuple] = {
    "bpe_merges_t2": ("replica", "tests.test_bpe", "test_merge_round_matches_python_replica"),
    "bpe_apply": ("replica", "tests.test_bpe", "test_bpe_apply_matches_python_replica"),
    "lpa_communities_t3": ("replica", "tests.test_graph_replicas", "test_lpa_matches_python_replica"),
    "bfs_hops_t3": ("replica", "tests.test_graph_replicas", "test_bfs_matches_python_replica"),
    "triangle_count": ("replica", "tests.test_graph_replicas", "test_triangle_count_matches_brute_force"),
    "pagerank_nations": ("replica", "tests.test_properties", "test_pagerank_matches_python_replica"),
    "kmeans_lloyd_t3": ("replica", "tests.test_selection", "test_kmeans_lloyd_matches_python_replica"),
    "hll_distinct": ("replica", "tests.test_sketches", "test_hll_oracle_sql_matches_python_replica"),
    # Both clustering queries' iterative CC resolves against the pure-Python
    # union-find replica on arbitrary random graphs, and the two independent
    # CC algorithms (min-label propagation vs large/small-star) are
    # differential-tested against each other on the real mined pair graph.
    "dedup_clusters": ("replica", "tests.test_clusters", "test_star_cc_matches_union_find_on_random_graphs"),
    "dedup_clusters_star": ("replica", "tests.test_clusters", "test_star_cc_matches_union_find_on_random_graphs"),
    # corpus_pipeline embeds the same connected_components kernel its
    # RECURSIVE oracle unrolls; the kernel-level union-find replica above is
    # the algorithm check, and the composition around it (filter + token +
    # anti-join + rollup) is plain one-pass SQL both engines express
    # independently. This row makes that transitive linkage explicit.
    "corpus_pipeline": ("replica", "tests.test_clusters", "test_star_cc_matches_union_find_on_random_graphs"),
    # The IVM rollup's oracle is a FULL RECOMPUTE over the raw table — a
    # genuinely independent dataflow, not the incremental path unrolled, so
    # a bug in the delta-merge cannot hide in a shared twin. Exempt.
    "rollup_incremental": ("exempt", "oracle recomputes from scratch; it shares no dataflow with the incremental merge"),
    # Staged round 10 (promotes round 11): not RECURSIVE/_tN so the sweep
    # below cannot catch it, but its oracle IS the same two-level bottom-k
    # dataflow replayed — registered here ahead of promotion so the window
    # slot arrives with its replica linkage already audited.
    "events_quantile_sketch": ("replica", "tests.test_sketches", "test_quantile_sketch_sample_matches_python_replica"),
    # Staged round 11: the DuckDB oracle is independent SQL (cross-join
    # argmin vs Spark's literal-array fold), but the PIPELINE design is
    # shared, so the whole operator is re-derived a third time in pure
    # Python loops — registered ahead of its round-12 promotion.
    "ivf_pq_topk": ("replica", "tests.test_ivf_pq", "test_ivf_pq_matches_python_replica"),
    # Staged round 14: the oracle re-derives the probe in independent SQL,
    # but the MinHash signature fold is the shared algorithmic kernel —
    # covered by the Hypothesis-driven pure-Python replica; the maintain
    # machinery itself (partition rewrite, emptied-dir drop) is pinned on
    # REAL files by the rebuild-equivalence test, which no shared dataflow
    # can satisfy vacuously. Registered ahead of its round-15 promotion.
    "minhash_index_upsert": ("replica", "tests.test_properties", "test_minhash_signature_matches_python_replica"),
}


def test_risk_class_sweep_is_fully_audited():
    """Heuristic sweep over the declared oracle surface: every oracle using
    WITH RECURSIVE and every round-unrolled kernel (``_tN`` naming
    convention) must hold a row in AUDIT — a new iterative operator that
    lands without a replica (or explicit exemption) fails here."""
    oracles = entry_mod.oracle_sql()
    risk = {n for n, s in oracles.items() if "RECURSIVE" in s.upper()}
    risk |= {n for n in oracles if re.search(r"_t\d+$", n)}
    missing = sorted(risk - set(AUDIT))
    assert not missing, (
        f"shared-dataflow oracles with no replica-audit row: {missing} — "
        f"add a pure-Python algorithm replica test (see module docstring)"
    )


def test_every_audit_row_resolves():
    """Replica rows must point at a test function that still exists (a
    rename silently voids the audit otherwise); exemptions must carry a
    non-trivial reason."""
    for name, row in AUDIT.items():
        if row[0] == "replica":
            _, mod_name, fn_name = row
            mod = importlib.import_module(mod_name)
            assert hasattr(mod, fn_name), (
                f"{name}: replica test {mod_name}.{fn_name} does not exist"
            )
        else:
            assert row[0] == "exempt" and len(row[1]) > 20, row
