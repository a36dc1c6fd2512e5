"""PageRank over the relationally-derived trade graph: oracle parity,
probability-mass sanity, and the edge-derivation plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_distributed_experiment_spark.operators import graph
from datafusion_distributed_experiment_spark.plans import stage_summary

from ._compare import assert_frames_match
from .conftest import SF_DIR


def test_pagerank_matches_oracle(spark, duck):
    spark_df = graph.pagerank_nations(spark, SF_DIR).toPandas()
    oracle_df = duck.execute(graph.oracles()["pagerank_nations"]).df()
    assert len(spark_df) == 25
    assert_frames_match(spark_df, oracle_df, "pagerank_nations")


def test_pagerank_mass_is_conserved_up_to_truncation(spark):
    """Ranks are a (damped) probability distribution in ppb: total stays in
    (0.5e9, 1e9] — integer truncation and dangling leak only ever LOSE
    mass — and every node keeps at least the damping floor."""
    rows = graph.pagerank_nations(spark, SF_DIR).collect()
    total = sum(r.rank_ppb for r in rows)
    assert 0.5 * graph.PPB < total <= graph.PPB, total
    floor = (100 - graph.DAMP_NUM) * graph.PPB // 100 // len(rows)
    assert all(r.rank_ppb >= floor for r in rows)


def test_pagerank_ranks_follow_inflow(spark):
    """The most-imported-from nation must outrank the least — the ranking
    reflects edge weight, not just the uniform prior."""
    rows = graph.pagerank_nations(spark, SF_DIR).collect()
    ranks = [r.rank_ppb for r in rows]
    assert max(ranks) > min(ranks), "degenerate: all ranks equal"


def test_trade_edges_broadcast_the_supplier_dimension(spark):
    """The edge derivation's only big shuffle should be lineitem-orders;
    the supplier dim must broadcast."""
    s = stage_summary(graph._trade_edges(spark, SF_DIR))
    assert s["broadcasts"] >= 1, s


def test_pagerank_handles_dangling_nodes(spark):
    """A node with no out-edges must still hold exactly the damping floor
    (mass leaks, nothing crashes): run the rank loop on a tiny synthetic
    graph where node 2 is a sink."""
    edges = spark.createDataFrame(
        [(0, 1, 10), (1, 2, 10), (0, 2, 30)], "src INT, dst INT, w LONG"
    )
    nodes = spark.createDataFrame([(0,), (1,), (2,)], "v INT")
    outw = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    wedges = edges.join(outw, "src")
    n = 3
    base = 150_000_000 // n
    ranks = nodes.select("v", F.lit(graph.PPB // n).cast("long").alias("r"))
    for _ in range(2):
        inflow = (
            wedges.join(ranks, wedges["src"] == ranks["v"])
            .select("dst", F.expr("((r * 85) DIV 100) * w DIV out_w").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = nodes.join(inflow, nodes["v"] == inflow["dst"], "left").select(
            "v", (F.lit(base) + F.coalesce(F.col("inflow"), F.lit(0))).cast("long").alias("r")
        )
    got = {r.v: r.r for r in ranks.collect()}
    assert got[0] == base  # nothing points at 0
    assert got[2] > got[1] > got[0]


def test_pagerank_overflow_guard_rejects_oversized_weights(spark):
    """The int64 ppb headroom bound (graph.py docstring) is enforced at
    runtime, not just documented: an edge weight past int64_max/PPB would
    silently wrap the per-edge contribution, so pagerank_frame refuses it
    with a typed planning error naming the remedy."""
    import pytest

    from datafusion_distributed_experiment_spark.errors import PlanningError

    nodes = spark.createDataFrame([(0,), (1,)], "v LONG")
    bad_w = (2**63 - 1) // graph.PPB + 1
    edges = spark.createDataFrame([(0, 1, bad_w)], "src LONG, dst LONG, w LONG")
    with pytest.raises(PlanningError, match="headroom"):
        graph.pagerank_frame(nodes, edges)
    # one below the bound is accepted and completes
    ok_edges = spark.createDataFrame([(0, 1, bad_w - 1)], "src LONG, dst LONG, w LONG")
    assert graph.pagerank_frame(nodes, ok_edges).count() == 2


def test_lpa_separates_weakly_bridged_cliques(spark):
    """Two triangles joined by ONE weak bridge edge: label propagation must
    converge each triangle to its own min label and never merge them across
    the bridge (the bridge weight loses every majority vote)."""
    edges = spark.createDataFrame(
        [
            (0, 1, 10), (0, 2, 10), (1, 2, 10),   # clique A
            (3, 4, 10), (3, 5, 10), (4, 5, 10),   # clique B
            (2, 3, 1),                            # weak bridge
            # isolated node 9 keeps its own label
        ],
        "u LONG, v LONG, w LONG",
    )
    nodes = spark.createDataFrame([(i,) for i in (0, 1, 2, 3, 4, 5, 9)], "v LONG")
    got = {r["v"]: r["community"] for r in graph.lpa_frame(nodes, edges).collect()}
    assert got[0] == got[1] == got[2] == 0
    assert got[3] == got[4] == got[5] == 3
    assert got[9] == 9


def test_lpa_tie_breaks_to_min_label(spark):
    """A node pulled equally by two labels adopts the smaller one."""
    edges = spark.createDataFrame(
        [(0, 2, 5), (1, 2, 5)], "u LONG, v LONG, w LONG"
    )
    nodes = spark.createDataFrame([(0,), (1,), (2,)], "v LONG")
    got = {r["v"]: r["community"] for r in graph.lpa_frame(nodes, edges, iters=1).collect()}
    assert got[2] == 0


def test_bfs_sources_are_zero_and_neighbors_one(spark):
    """Region-0 nations report hop 0; every kept-graph neighbor of a source
    reports 1; anything the 3-round frontier never reached reports the INF
    sentinel."""
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    hops = {r["v"]: r["hops"] for r in graph.bfs_hops_t3(spark, sf).collect()}
    sources = {
        r["n_nationkey"]
        for r in spark.read.parquet(f"{sf}/nation.parquet")
        .filter(F.col("n_regionkey") == graph.BFS_SOURCE_REGION)
        .collect()
    }
    kept = graph._kept_undirected(spark, sf).collect()
    neighbors_of_sources = {
        r["v"] for r in kept if r["u"] in sources
    } | {r["u"] for r in kept if r["v"] in sources}
    for s in sources:
        assert hops[s] == 0
    for n in neighbors_of_sources - sources:
        assert hops[n] == 1, (n, hops[n])
    assert all(h in (0, 1, 2, 3, graph.BFS_INF) for h in hops.values())


def test_threshold_headroom_guard():
    """Trip + pass paths of the kept-edge cross-multiplication guard."""
    import pytest

    from datafusion_distributed_experiment_spark.errors import PlanningError
    from datafusion_distributed_experiment_spark.operators.graph import (
        check_threshold_headroom,
    )

    check_threshold_headroom(10**10, 10**6)  # 10B pairs, 1M max weight: fine
    with pytest.raises(PlanningError, match="int64 headroom"):
        check_threshold_headroom(10**10, 2**63 // (100 * 10**10) + 1)


def test_orientation_key_guard_trips_and_passes(spark):
    """Round-11 review fix: node ids >= ORIENT_KEY_BASE collide in the
    deg*BASE+id orientation key and silently DROP triangles (no crash), so
    the precondition is now guarded loudly like every other headroom
    check in this module."""
    import pytest

    from datafusion_distributed_experiment_spark.errors import PlanningError
    from datafusion_distributed_experiment_spark.operators.graph import (
        ORIENT_KEY_BASE,
        check_orientation_key_headroom,
        triangle_frame,
    )

    check_orientation_key_headroom(0)
    check_orientation_key_headroom(ORIENT_KEY_BASE - 1)
    with pytest.raises(PlanningError, match="orientation key"):
        check_orientation_key_headroom(ORIENT_KEY_BASE)
    big = ORIENT_KEY_BASE + 5
    kept = spark.createDataFrame([(1, big), (big, 2), (1, 2)], "u long, v long")
    with pytest.raises(PlanningError, match="orientation key"):
        triangle_frame(kept)
    # round-12 review fix: NEGATIVE ids reach down into the next lower
    # degree band the same way (deg-2/id--5 keys like deg-1/id-999995) and
    # silently drop triangles — the guard must reject them too
    with pytest.raises(PlanningError, match="orientation key"):
        check_orientation_key_headroom(10, -1)
    neg = spark.createDataFrame([(-5, 1), (1, 2), (2, -5)], "u long, v long")
    with pytest.raises(PlanningError, match="orientation key"):
        triangle_frame(neg)


def test_pagerank_frame_empty_graph_returns_empty(spark):
    """Round-11 review fix: an empty node set must yield an empty result,
    not ZeroDivisionError from the base-rank division."""
    from datafusion_distributed_experiment_spark.operators.graph import pagerank_frame

    nodes = spark.createDataFrame([], "v long")
    edges = spark.createDataFrame([], "src long, dst long, w long")
    out = pagerank_frame(nodes, edges)
    assert out.columns == ["v", "rank_ppb"]
    assert out.collect() == []
