"""Algorithm-level replicas for the iterative graph kernels on ARBITRARY
constructed graphs (hypothesis-driven).

Why this test class exists: the cross-engine oracle proves Spark == DuckDB,
but for these operators the DuckDB side is the SAME dataflow unrolled as
CTEs — a semantic bug in the shared dataflow passes the oracle on both
engines (exactly how the pairless-BPE-round bug survived seven rounds until
the pure-Python replica caught it, operators/bpe.py). These tests replay
each kernel's published algorithm directly in Python on random small graphs:
weighted synchronous label propagation (Raghavan 2007), multi-source
min-plus BFS, and per-node triangle counting (vs brute force over all node
triples). pagerank already has this coverage (test_properties.py)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from datafusion_distributed_experiment_spark.operators.graph import (
    BFS_INF,
    LPA_ITERS,
    bfs_frame,
    lpa_frame,
    triangle_frame,
)

# random undirected weighted graph on <= 10 nodes: unique (u < v) pairs
_EDGES = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=1, max_value=50),
    ).filter(lambda t: t[0] != t[1]),
    min_size=1,
    max_size=20,
).map(
    lambda es: list(
        {(min(u, v), max(u, v)): w for u, v, w in es}.items()
    )  # dedup pairs, last weight wins
)


def _frames(spark, edges):
    und = spark.createDataFrame(
        [(u, v, w) for (u, v), w in edges], "u long, v long, w long"
    )
    node_ids = sorted({n for (u, v), _ in edges for n in (u, v)})
    nodes = spark.createDataFrame([(n,) for n in node_ids], "v long")
    return nodes, und, node_ids


@given(edges=_EDGES)
@settings(max_examples=20, deadline=None)
def test_lpa_matches_python_replica(spark, edges):
    """Synchronous weighted LPA: each round every node adopts the label
    with the greatest incident weight among its CURRENT neighbors' labels
    (ties -> smallest label; nodes with no neighbor keep theirs)."""
    nodes, und, node_ids = _frames(spark, edges)

    adj: dict[int, list[tuple[int, int]]] = {n: [] for n in node_ids}
    for (u, v), w in edges:
        adj[u].append((v, w))
        adj[v].append((u, w))
    lab = {n: n for n in node_ids}
    for _ in range(LPA_ITERS):
        new = {}
        for n in node_ids:
            if not adj[n]:
                new[n] = lab[n]
                continue
            score: dict[int, int] = {}
            for m, w in adj[n]:
                score[lab[m]] = score.get(lab[m], 0) + w
            best = max(score.items(), key=lambda kv: (kv[1], -kv[0]))
            new[n] = best[0]
        lab = new

    got = {r["v"]: r["community"] for r in lpa_frame(nodes, und).collect()}
    assert got == lab, (edges, got, lab)


@given(edges=_EDGES, n_sources=st.integers(min_value=0, max_value=3))
@settings(max_examples=20, deadline=None)
def test_bfs_matches_python_replica(spark, edges, n_sources):
    """Multi-source min-plus BFS with a fixed round budget: dist = hop
    count from the nearest source, BFS_INF when unreached within 3 rounds
    (including the no-source graph: everything stays at the sentinel)."""
    from pyspark.sql import functions as F

    nodes, und, node_ids = _frames(spark, edges)
    sources = set(node_ids[:n_sources])
    seeds = nodes.select(
        "v",
        F.when(F.col("v").isin(list(sources) or [-1]), F.lit(0))
        .otherwise(F.lit(BFS_INF))
        .cast("long")
        .alias("d"),
    )

    adj: dict[int, set[int]] = {n: set() for n in node_ids}
    for (u, v), _ in edges:
        adj[u].add(v)
        adj[v].add(u)
    dist = {n: (0 if n in sources else BFS_INF) for n in node_ids}
    for _ in range(3):  # BFS_ITERS synchronous rounds
        dist = {
            n: min(
                dist[n],
                min((dist[m] + 1 for m in adj[n]), default=BFS_INF),
                BFS_INF,
            )
            for n in node_ids
        }

    got = {r["v"]: r["hops"] for r in bfs_frame(seeds, und).collect()}
    assert got == dist, (edges, sorted(sources), got, dist)


@given(edges=_EDGES)
@settings(max_examples=20, deadline=None)
def test_triangle_count_matches_brute_force(spark, edges):
    """Degree-ordered wedge counting == brute force over all node triples;
    every node of the graph reports (nodes in no triangle report 0)."""
    from itertools import combinations

    _, und, node_ids = _frames(spark, edges)
    eset = {pair for pair, _ in edges}
    per_node = {n: 0 for n in node_ids}
    for a, b, c in combinations(node_ids, 3):
        if (a, b) in eset and (b, c) in eset and (a, c) in eset:
            per_node[a] += 1
            per_node[b] += 1
            per_node[c] += 1

    got = {r["node"]: r["n_triangles"] for r in triangle_frame(und).collect()}
    assert got == per_node, (edges, got, per_node)
