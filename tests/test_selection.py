"""Selection-tier unit/differential tests.

``kmeans_lloyd`` is differential-tested against an independent pure-Python
replica of the same integer-exact Lloyd spec (the strategy the repo uses for
every iterative operator: pagerank vs unrolled Python, CC vs union-find) —
the Spark implementation and the replica share only the spec, not code.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from datafusion_distributed_experiment_spark.operators.selection import (
    _assign_to_literal_centroids,
    kmeans_lloyd,
)

from .conftest import SF_DIR


def _replica_lloyd(vecs: list[tuple[int, list[float]]], k: int, iters: int):
    """Independent Python replica: ppm quantization, squared-L2 argmin with
    (dist, cid) tie-break, truncating integer mean, frozen empty clusters."""
    q = [(vid, [math.floor(1e6 * x) for x in v]) for vid, v in sorted(vecs)]
    cents = {vid: list(xp) for vid, xp in q[:k]}

    def assign():
        out = {}
        for vid, xp in q:
            best = min(
                (sum((a - b) * (a - b) for a, b in zip(xp, cxp)), cid)
                for cid, cxp in cents.items()
            )
            out[vid] = best  # (dist, cid)
        return out

    a = assign()
    for _ in range(iters):
        sums: dict[int, list[int]] = {}
        counts: dict[int, int] = {}
        for vid, xp in q:
            cid = a[vid][1]
            acc = sums.setdefault(cid, [0] * len(xp))
            for i, v in enumerate(xp):
                acc[i] += v
            counts[cid] = counts.get(cid, 0) + 1
        for cid in cents:
            if cid in sums:
                c = counts[cid]
                cents[cid] = [
                    (abs(s) // c if s >= 0 else -(abs(s) // c)) for s in sums[cid]
                ]
        a = assign()
    return {vid: (cid, d) for vid, (d, cid) in a.items()}, cents


def test_kmeans_lloyd_matches_python_replica(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select("vec_id", "embedding")
    out, cents = kmeans_lloyd(emb, k=4, iters=2)
    got = {int(r["vec_id"]): (int(r["cluster"]), int(r["dist"])) for r in out.collect()}

    raw = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.collect()
    ]
    want, want_cents = _replica_lloyd(raw, k=4, iters=2)
    assert got == want
    assert {cid: cxp for cid, cxp in cents} == want_cents
    # the iterations actually moved the centroids off their seed vectors
    seed = {vid: [math.floor(1e6 * x) for x in v] for vid, v in sorted(raw)[:4]}
    assert any(cxp != seed[cid] for cid, cxp in cents)


def test_kmeans_lloyd_freezes_emptied_clusters(spark):
    # every vector identical -> all rows tie to the smallest cid; the other
    # cluster loses all members and must keep its seed centroid verbatim
    emb = spark.createDataFrame(
        [(i, [0.5, 0.5]) for i in range(6)], "vec_id long, embedding array<float>"
    )
    out, cents = kmeans_lloyd(emb, k=2, iters=2)
    rows = out.collect()
    assert {int(r["cluster"]) for r in rows} == {0}
    assert all(int(r["dist"]) == 0 for r in rows)
    assert dict(cents)[1] == [500000, 500000]  # frozen at its seed


def test_kmeans_estep_is_map_only(spark):
    """The literal-centroid E-step must add no exchange over its input —
    the property that makes each Lloyd round one corpus scan."""
    from datafusion_distributed_experiment_spark.plans import stage_summary

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select("vec_id", "embedding")
    qvecs = emb.select(
        "vec_id", F.expr("transform(embedding, x -> CAST(FLOOR(1e6 * x) AS BIGINT))").alias("xp")
    )
    cents = [(0, [0] * 64), (1, [1000] * 64)]
    base = stage_summary(qvecs)
    s = stage_summary(_assign_to_literal_centroids(qvecs, cents))
    assert s["exchanges"] == base["exchanges"], (s, base)
    assert s["broadcasts"] == base["broadcasts"], (s, base)
    assert s["aggregates"] == 0, s


def test_fixture_embedding_dim_matches_oracle_expansion():
    """The similarity/selection oracles expand dot products and distance
    lambdas to a fixed DIM=64 term count (DUCK_DOT et al.), while the Spark
    side folds over the actual array length. If the driver's fixture dim
    ever drifts, the two sides would silently compute different values —
    this pins the drift to a loud failure instead (the ADVICE-flagged
    failure mode on kmeans_assign, closed generally here)."""
    import pyarrow.parquet as pq

    from datafusion_distributed_experiment_spark.operators import selection, similarity

    assert selection.DIM == similarity.DIM == 64
    for sf in ("0.001", "0.01", "0.1"):
        schema = pq.ParquetFile(f"/root/testdata/sf{sf}/embeddings.parquet").schema_arrow
        first = pq.ParquetFile(
            f"/root/testdata/sf{sf}/embeddings.parquet"
        ).read_row_group(0, columns=["embedding"])
        dims = {len(v) for v in first.column("embedding")[:50].to_pylist()}
        assert dims == {selection.DIM}, (
            f"sf{sf} embedding dim {dims} != oracle expansion {selection.DIM}"
        )
        assert str(schema.field("embedding").type).startswith("list"), schema


def test_dsir_weight_headroom_guard():
    """Both documented trip conditions of the int64 guard, plus the pass
    path at realistic 100 TB-ish scales (the bm25/pagerank guard pattern)."""
    import pytest

    from datafusion_distributed_experiment_spark.errors import PlanningError
    from datafusion_distributed_experiment_spark.operators.selection import (
        check_weight_headroom,
    )

    check_weight_headroom(10**12, 5_000_000)  # 1T bigrams, 5M-bigram doc: fine
    with pytest.raises(PlanningError, match="int64 headroom"):
        check_weight_headroom(2**63 // 1_000_000, 10)  # numerator bound
    with pytest.raises(PlanningError, match="int64 headroom"):
        check_weight_headroom(10**9, 2**63 // 10**12 + 1)  # per-doc sum bound
