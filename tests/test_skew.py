"""Skew-guard tests: the frequent-bucket caps exercised ON DATA, not plans.

Both LSH tiers carry a hub-bucket suppression guard (``dedup._cap_buckets``
with ``MAX_BAND_BUCKET`` / ``VEC_BUCKET_CAP``) that is dormant at the
driver's fixture scale — nothing in the synthetic corpus produces an
oversized bucket, so until now the guard was verified only structurally.
These tests force it to FIRE and check the capped output against the same
DuckDB oracle the driver uses: the 100 TB skew contract (one hot key costs
its own bucket's pairs, never the rest of the corpus) proven end-to-end.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from datafusion_distributed_experiment_spark.operators import dedup, similarity

from ._compare import assert_frames_match
from .conftest import SF_DIR


def test_minhash_skew_cap_fires_and_matches_oracle(spark, duck):
    # (a) the fixture genuinely forces the guard: pre-cap hub band buckets
    # exceed MAX_BAND_BUCKET (HUB_COPIES identical docs share every band).
    sigs = dedup._with_signature(dedup._skew_corpus(spark, SF_DIR)).select(
        "doc_id", "toks", "sig"
    )
    pre = dedup._band_rows(sigs).groupBy("band_idx", "x", "y").count()
    max_bucket = pre.agg(F.max("count")).collect()[0][0]
    assert max_bucket > dedup.MAX_BAND_BUCKET, (
        f"skew fixture failed to exceed the cap: max bucket {max_bucket}"
    )

    # (b) the capped result is oracle-verified (the oracle applies the
    # identical cap), and (c) no hub replica survives into any pair.
    sdf = dedup.minhash_pairs_skew(spark, SF_DIR).toPandas()
    odf = duck.execute(dedup.oracles()["minhash_pairs_skew"]).df()
    assert_frames_match(sdf, odf, "minhash_pairs_skew")
    hub = set(range(dedup.HUB_OFFSET, dedup.HUB_OFFSET + dedup.HUB_COPIES))
    assert not (set(sdf.doc_a) | set(sdf.doc_b)) & hub
    # the cap only ever REMOVES candidacy (skew pairs are a subset of the
    # uncapped corpus's pairs), and the hub's blast radius is bounded: docs
    # that merely share one band bucket with the hub lose that bucket, so
    # the overwhelming majority of baseline pairs still come out
    base = dedup.minhash_dedup_pairs(spark, SF_DIR).toPandas()
    base_pairs = set(zip(base.doc_a, base.doc_b))
    skew_pairs = set(zip(sdf.doc_a, sdf.doc_b))
    assert skew_pairs <= base_pairs
    assert len(skew_pairs) >= 0.8 * len(base_pairs)


@pytest.fixture(scope="module")
def skewed_embeddings_dir(tmp_path_factory):
    """An embeddings.parquet big enough to trip the similarity tier's size
    gate (> VEC_CAP_MIN_ROWS) with a planted sign-bucket hub (~340 vectors
    in bucket 255 > VEC_BUCKET_CAP): correlated embeddings sharing a sign
    pattern, the degenerate shape the cap exists for."""
    n, dim = similarity.VEC_CAP_MIN_ROWS + 200, similarity.DIM
    rng = np.random.default_rng(7)
    emb = rng.standard_normal((n, dim)).astype("float32")
    emb[1000:1300, :8] = np.abs(emb[1000:1300, :8]) + np.float32(0.01)
    table = pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.array(emb.tolist(), type=pa.list_(pa.float32())),
        }
    )
    d = tmp_path_factory.mktemp("skew_vecs")
    pq.write_table(table, str(d / "embeddings.parquet"))
    return str(d)


def test_ann_lsh_size_gated_cap_fires_and_matches_oracle(spark, skewed_embeddings_dir):
    sf_dir = skewed_embeddings_dir
    # the footer probe sees > VEC_CAP_MIN_ROWS rows -> guard ON
    assert similarity._needs_bucket_cap(sf_dir)
    # and the data genuinely trips it: the planted hub bucket exceeds the cap
    vecs = similarity._vectors(spark, sf_dir).withColumn(
        "bucket", similarity._bucket(F.col("v"))
    )
    hub_n = vecs.filter(F.col("bucket") == 255).count()
    assert hub_n > similarity.VEC_BUCKET_CAP

    sdf = similarity.ann_lsh(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )
    odf = con.execute(similarity.oracles()["ann_lsh"]).df()
    assert_frames_match(sdf, odf, "ann_lsh[skewed]")
    # capped-bucket members can appear as neither query nor neighbor
    hub_ids = {r["vec_id"] for r in vecs.filter(F.col("bucket") == 255).collect()}
    assert not (set(sdf.query_id) | set(sdf.neighbor_id)) & hub_ids
    # and the guard didn't blank the answer: uncapped queries still rank
    assert len(sdf) > 0
