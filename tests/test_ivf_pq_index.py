"""IVF-PQ persisted-index tests (oracle parity over the on-disk index
runs in tests/test_staged_oracle.py; these pin the build/serve split).

The three claims that make the index worth persisting, each pinned:
(1) serving from the persisted index is BIT-IDENTICAL to the in-flight
    ivf_pq_topk (the shared _pq_serve kernel over a disk round trip);
(2) the persisted table holds EXACTLY the _pq_encode output for the
    whole corpus — including lists no probe touches, which the serve
    result (and the DuckDB oracle, which only joins probed lists) can
    never observe;
(3) the probe path PRUNES BUCKETS: the probed-list IN-filter on the
    bucketed table plans a scan of at most |probed lists| of the
    IVF_PQ_INDEX_BUCKETS buckets (SelectedBucketsCount), and pruning is
    sound — the pruned serve equals a serve over the unpruned index.
"""

from __future__ import annotations

from datafusion_distributed_experiment_spark.operators.similarity import (
    IVF_PQ_INDEX_BUCKETS,
    IVF_PQ_INDEX_TABLE,
    IVF_PROBE,
    _pq_encode,
    _pq_fit,
    _pq_serve,
    _vectors,
    ivf_pq_index_build,
    ivf_pq_topk,
    serve_pq_index,
)
from pyspark.sql import functions as F

from .conftest import SF_DIR


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_index_serve_equals_inflight_topk(spark):
    """(1) build+persist+probe == the in-flight operator, row for row —
    the disk round trip through the bucketed table changes nothing."""
    got = _rows(ivf_pq_index_build(spark, SF_DIR))
    want = _rows(ivf_pq_topk(spark, SF_DIR))
    assert got == want and len(got) > 0


def test_index_persists_exact_encode(spark):
    """(2) full-index integrity: the persisted table is exactly the
    encode output for EVERY vector — including lists outside any probe,
    which no serve result can observe."""
    ivf_pq_index_build(spark, SF_DIR).collect()  # build side effect
    vecs = (
        _vectors(spark, SF_DIR)
        .withColumn("xp", F.expr("transform(v, x -> CAST(FLOOR(1e6 * x) AS BIGINT))"))
        .localCheckpoint()
    )
    centroids, cb, _ = _pq_fit(vecs)
    want = sorted(
        (int(r["vec_id"]), int(r["list_id"]), tuple(r["codes"]))
        for r in _pq_encode(vecs, centroids, cb).collect()
    )
    got = sorted(
        (int(r["vec_id"]), int(r["list_id"]), tuple(r["codes"]))
        for r in spark.table(IVF_PQ_INDEX_TABLE).collect()
    )
    assert got == want and len(got) > 0


def test_single_query_probe_prunes_buckets(spark):
    """(3) the serving shape: ONE query probes IVF_PROBE lists, and the
    planned index scan selects at most that many of the
    IVF_PQ_INDEX_BUCKETS buckets (SelectedBucketsCount) — the persistent
    analog of the probe join reading a vanishing fraction of a 100 TB
    index. Pruning must also be SOUND: the pruned serve equals the same
    serve over the unpruned index."""
    from datafusion_distributed_experiment_spark.plans import plan_string

    ivf_pq_index_build(spark, SF_DIR).collect()  # build side effect
    vecs = (
        _vectors(spark, SF_DIR)
        .withColumn("xp", F.expr("transform(v, x -> CAST(FLOOR(1e6 * x) AS BIGINT))"))
        .localCheckpoint()
    )
    centroids, cb, seed_rows = _pq_fit(vecs)
    index = spark.table(IVF_PQ_INDEX_TABLE)
    served = serve_pq_index(
        spark, vecs, index, centroids, cb, seed_rows, n_queries=1
    )
    plan = plan_string(served)
    assert "SelectedBucketsCount" in plan, plan
    import re

    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m, plan
    selected, total = int(m.group(1)), int(m.group(2))
    assert total == IVF_PQ_INDEX_BUCKETS
    assert 0 < selected <= IVF_PROBE, (
        f"one query probes {IVF_PROBE} lists; the scan must touch at most "
        f"that many buckets, got {selected}/{total}"
    )
    # soundness: pruning removes only rows no probe can join
    unpruned = _pq_serve(
        spark, vecs, index, centroids, cb, seed_rows, n_queries=1
    )
    assert _rows(served) == _rows(unpruned) and len(_rows(served)) > 0
