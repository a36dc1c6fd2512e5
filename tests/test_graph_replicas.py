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


# ------------------------------------------------------------------ #
# round-14 graph/edge adversarial hardening: isolated nodes, dangling
# edge endpoints, self-loop rows, non-positive weights
# ------------------------------------------------------------------ #


@given(edges=_EDGES, n_isolated=st.integers(min_value=1, max_value=3))
@settings(max_examples=10, deadline=None)
def test_isolated_nodes_keep_label_and_stay_unreached(spark, edges, n_isolated):
    """Nodes present in ``nodes`` but touching no edge: LPA must keep
    their own label (no neighbor ever outvotes it) and BFS must report the
    unreached sentinel — previously only nodes derived FROM edges were
    property-tested, so the isolated case rode on the declared query's
    data shape alone."""
    from pyspark.sql import functions as F

    nodes, und, node_ids = _frames(spark, edges)
    isolated = [100 + i for i in range(n_isolated)]  # disjoint from 0..9
    nodes = nodes.unionAll(
        spark.createDataFrame([(i,) for i in isolated], "v long")
    )
    lpa = {r["v"]: r["community"] for r in lpa_frame(nodes, und).collect()}
    for i in isolated:
        assert lpa[i] == i, (i, lpa)
    seeds = nodes.select(
        "v",
        F.when(F.col("v") == node_ids[0], F.lit(0))
        .otherwise(F.lit(BFS_INF))
        .cast("long")
        .alias("d"),
    )
    hops = {r["v"]: r["hops"] for r in bfs_frame(seeds, und).collect()}
    for i in isolated:
        assert hops[i] == BFS_INF, (i, hops)


@given(edges=_EDGES)
@settings(max_examples=10, deadline=None)
def test_dangling_edge_endpoints_equal_removing_the_edge(spark, edges):
    """Edges whose endpoint is NOT in ``nodes`` (a dangling reference —
    upstream key drift): LPA and BFS must behave exactly as if the
    dangling edge were absent, because an unknown endpoint never holds a
    label/distance to propagate and never appears in the output. Pinned by
    equality with the same kernel over the filtered edge list."""
    nodes, und, node_ids = _frames(spark, edges)
    dangling = spark.createDataFrame(
        [(node_ids[0], 999, 7), (998, node_ids[-1], 5)], "u long, v long, w long"
    )
    poisoned = und.unionAll(dangling)

    want = sorted(tuple(r) for r in lpa_frame(nodes, und).collect())
    got = sorted(tuple(r) for r in lpa_frame(nodes, poisoned).collect())
    assert got == want

    from pyspark.sql import functions as F

    seeds = nodes.select(
        "v",
        F.when(F.col("v") == node_ids[0], F.lit(0))
        .otherwise(F.lit(BFS_INF))
        .cast("long")
        .alias("d"),
    )
    want_b = sorted(tuple(r) for r in bfs_frame(seeds, und).collect())
    got_b = sorted(tuple(r) for r in bfs_frame(seeds, poisoned).collect())
    assert got_b == want_b


@given(edges=_EDGES)
@settings(max_examples=10, deadline=None)
def test_self_loop_rows_are_ignored_by_frame_kernels(spark, edges):
    """A ``u == v`` row in the frame-API edge input (the declared queries
    canonicalize via _undirected_collapse, but the frame API is public):
    a self-edge is not a neighbor relation — left in, it would double-vote
    a node's own LPA label through both union branches and seed degenerate
    triangle wedges. The kernels now drop it defensively; pinned by
    equality with the loop-free graph."""
    nodes, und, node_ids = _frames(spark, edges)
    loops = spark.createDataFrame(
        [(node_ids[0], node_ids[0], 50), (node_ids[-1], node_ids[-1], 1)],
        "u long, v long, w long",
    )
    poisoned = und.unionAll(loops)

    assert sorted(tuple(r) for r in lpa_frame(nodes, poisoned).collect()) == sorted(
        tuple(r) for r in lpa_frame(nodes, und).collect()
    )
    from pyspark.sql import functions as F

    seeds = nodes.select(
        "v",
        F.when(F.col("v") == node_ids[0], F.lit(0))
        .otherwise(F.lit(BFS_INF))
        .cast("long")
        .alias("d"),
    )
    assert sorted(tuple(r) for r in bfs_frame(seeds, poisoned).collect()) == sorted(
        tuple(r) for r in bfs_frame(seeds, und).collect()
    )
    assert sorted(
        tuple(r) for r in triangle_frame(poisoned.select("u", "v")).collect()
    ) == sorted(tuple(r) for r in triangle_frame(und.select("u", "v")).collect())


def test_pagerank_dangling_dst_leak_is_deterministic(spark):
    """PageRank with an edge toward an UNKNOWN node: the out-weight of the
    source still counts the dangling edge (mass genuinely leaks through
    it, the same simplification as dangling NODES), and the leaked inflow
    is discarded with the unknown id. Pinned against a hand-rolled
    replica of exactly that semantics — neither 'ignore the edge' nor
    'KeyError', both of which a refactor could silently introduce."""
    from datafusion_distributed_experiment_spark.operators.graph import (
        DAMP_DEN,
        DAMP_NUM,
        PPB,
        pagerank_frame,
    )

    known = [0, 1]
    edge_list = [(0, 1, 1), (0, 99, 3), (1, 0, 1)]  # (0, 99) leaks 3/4 of 0's mass
    nodes = spark.createDataFrame([(v,) for v in known], "v long")
    edges = spark.createDataFrame(edge_list, "src long, dst long, w long")

    n = len(known)
    out_w = {0: 4, 1: 1}
    base = (DAMP_DEN - DAMP_NUM) * PPB // DAMP_DEN // n
    r = {v: PPB // n for v in known}
    for _ in range(2):
        inflow = {v: 0 for v in known}
        for s, d, w in edge_list:
            if d in inflow:  # the 99-bound contribution is discarded
                inflow[d] += ((r[s] * DAMP_NUM) // DAMP_DEN) * w // out_w[s]
        r = {v: base + inflow[v] for v in known}

    got = {row["v"]: row["rank_ppb"] for row in pagerank_frame(nodes, edges, iters=2).collect()}
    assert got == r, (got, r)


def test_pagerank_rejects_non_positive_weights(spark):
    """Round-14 hardening: a zero edge weight can sum a node's out-weight
    to zero, and `w DIV out_w` then divides by zero — NULL on Spark
    (contributions silently vanish) but a hard error on the DuckDB
    oracle's unrolled twin, the worst cross-engine divergence shape;
    negative weights break the rank-mass invariant. Both now raise
    PlanningError loudly."""
    import pytest

    from datafusion_distributed_experiment_spark.errors import PlanningError
    from datafusion_distributed_experiment_spark.operators.graph import pagerank_frame

    nodes = spark.createDataFrame([(0,), (1,)], "v long")
    for bad_w in (0, -5):
        edges = spark.createDataFrame(
            [(0, 1, bad_w), (1, 0, 1)], "src long, dst long, w long"
        )
        with pytest.raises(PlanningError, match="must be positive"):
            pagerank_frame(nodes, edges, iters=1)
