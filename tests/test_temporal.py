"""Kernel-level tests for the temporal operators: differential checks of the
scalable plans against brute-force reference implementations on Spark itself
(the cross-engine oracle in test_corpus_oracle covers the driver-facing
queries; these pin the generic kernels on adversarial shapes — ties, empty
matches, strict mode, bucket boundaries)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datafusion_distributed_experiment_spark.operators.temporal import (
    KMV_K,
    asof_join,
    hash48,
    kmv_distinct,
    range_join_intervals,
)
from datafusion_distributed_experiment_spark.plans import stage_summary


def _left(spark, n=400, keys=7):
    """Deterministic point rows; hash-scattered ts with deliberate collisions."""
    return spark.range(n).select(
        (F.col("id") % keys).alias("k"),
        F.pmod(F.hash("id"), 1000).cast("long").alias("ts"),
        F.col("id").alias("lid"),
    )


def _right(spark, n=300, keys=7):
    # unique per (k, ts) by construction (no pre-agg shuffle, so the plan
    # test below sees the kernel's exchange alone); ts values are multiples
    # of 13 < 1000, so equal-ts collisions with the left side DO occur.
    return spark.range(n).select(
        (F.col("id") % keys).alias("k"),
        ((F.col("id") / keys).cast("long") * 13 % 1000).cast("long").alias("ts"),
        F.col("id").alias("payload"),
    )


def _brute_asof(left, right, strict: bool):
    """Reference semantics: inequality join + per-left-row argmax."""
    cmp = F.col("r_ts") < F.col("ts") if strict else F.col("r_ts") <= F.col("ts")
    j = left.join(
        right.select(F.col("k"), F.col("ts").alias("r_ts"), "payload"), "k", "left"
    ).withColumn("ok", cmp)
    w = Window.partitionBy("lid").orderBy(
        F.when(F.col("ok"), F.col("r_ts")).asc_nulls_first()
    )
    best = j.withColumn("rn", F.row_number().over(w)).withColumn(
        "last", F.max("rn").over(Window.partitionBy("lid"))
    )
    return best.filter(F.col("rn") == F.col("last")).select(
        "k",
        "ts",
        "lid",
        F.when(F.col("ok"), F.col("r_ts")).alias("ts_asof"),
        F.when(F.col("ok"), F.col("payload")).alias("payload"),
    )


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_asof_join_matches_bruteforce(spark):
    left, right = _left(spark), _right(spark)
    got = asof_join(left, right, on=["k"], ts="ts", payloads=["payload"])
    want = _brute_asof(left, right, strict=False)
    cols = ["k", "ts", "lid", "ts_asof", "payload"]
    assert _rows(got, cols) == _rows(want, cols)


def test_asof_join_strict_excludes_equal_ts(spark):
    left, right = _left(spark), _right(spark)
    got = asof_join(left, right, on=["k"], ts="ts", payloads=["payload"], strict=True)
    want = _brute_asof(left, right, strict=True)
    cols = ["k", "ts", "lid", "ts_asof", "payload"]
    assert _rows(got, cols) == _rows(want, cols)
    # strictness is observable: some left row shares a ts with a right row
    non_strict = asof_join(left, right, on=["k"], ts="ts", payloads=["payload"])
    assert _rows(got, cols) != _rows(non_strict, cols)


def test_asof_join_null_payload_and_null_ts_rows(spark):
    """Review-found latent divergences vs the DuckDB ASOF semantics
    (round 11): (a) a matched right row whose payload is NULL must yield a
    NULL payload — the old per-column ``last(payload, ignorenulls)``
    leaked the PREVIOUS row's payload while ``ts_asof`` came from the
    matched row; (b) a right row with a NULL ts can never match, and under
    the window's nulls-first order it must not shadow the no-match case."""
    left = spark.createDataFrame(
        [(1, 25, 100), (1, 5, 101)], "k long, ts long, lid long"
    )
    right = spark.createDataFrame(
        [(1, 10, 5), (1, 20, None), (1, None, 777)],
        "k long, ts long, payload long",
    )
    got = {
        r["lid"]: (r["ts_asof"], r["payload"])
        for r in asof_join(
            left, right, on=["k"], ts="ts", payloads=["payload"]
        ).collect()
    }
    assert got[100] == (20, None), "payload must come from the MATCHED row"
    assert got[101] == (None, None), "NULL-ts right rows can never match"


def test_asof_join_is_single_shuffle(spark):
    """The whole point of the union+window plan: ONE exchange (on the join
    key), versus the inequality join's per-key quadratic fan-out."""
    left, right = _left(spark), _right(spark)
    s = stage_summary(asof_join(left, right, on=["k"], ts="ts", payloads=["payload"]))
    assert s["exchanges"] == 1, s


def test_range_join_matches_direct(spark):
    points = _left(spark).select("k", "ts", "lid")
    iv = spark.range(60).select(
        (F.col("id") % 7).alias("k"),
        F.pmod(F.hash("id"), 800).cast("long").alias("start"),
        # spans several 100-wide buckets; some end before any point
        (
            F.pmod(F.hash("id"), 800) + 50 + F.pmod(F.hash(F.col("id") + 7), 300)
        ).cast("long").alias("end"),
        F.col("id").alias("ivid"),
    )
    got = range_join_intervals(
        points, iv, on=["k"], ts="ts", start="start", end="end", bucket_ms=100
    )
    want = points.join(iv, "k").filter(F.col("ts").between(F.col("start"), F.col("end")))
    cols = ["k", "ts", "lid", "start", "end", "ivid"]
    assert _rows(got, cols) == _rows(want, cols)
    assert got.count() > 0  # the comparison is not vacuous


def test_kmv_tree_equals_flat_kmin(spark):
    """The two-level salt tree must return EXACTLY the flat k smallest
    distinct hashes (min-k associativity) — not an approximation of them."""
    df = spark.range(5000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 700).alias("key"),  # 700 distinct >> k
    )
    got = kmv_distinct(df, "g", hash48(F.col("key")), k=KMV_K, n_salt=8)
    flat = (
        df.select("g", hash48(F.col("key")).alias("h"))
        .distinct()
        .withColumn("rn", F.row_number().over(Window.partitionBy("g").orderBy("h")))
        .filter(F.col("rn") <= KMV_K)
        .groupBy("g")
        .agg(F.count("*").alias("n_kept"), F.max("h").alias("kth_hash"))
    )
    g = {r.g: (r.n_kept, r.kth_hash) for r in got.collect()}
    f = {r.g: (r.n_kept, r.kth_hash) for r in flat.collect()}
    assert g == f
    # sanity: 3 ⊥ 700, so every group sees all 700 keys; a k=64 sketch has
    # ~12.5% stderr — accept a generous ±3.5σ band around 700
    for r in got.collect():
        assert 400 <= r.est_distinct <= 1200, r


def test_kmv_excludes_null_keys(spark):
    """COUNT(DISTINCT) semantics, pinned after a review-found engine
    divergence (round 11): a NULL key must not count as a distinct value
    (collect_list skipped it on Spark while the oracle's ROW_NUMBER ranked
    it NULLS-LAST into any under-k group), and a group holding ONLY NULL
    keys must emit no row on either engine."""
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", None), ("b", None)],
        "g string, key long",
    )
    rows = {r.g: r for r in kmv_distinct(df, "g", hash48(F.col("key"))).collect()}
    assert set(rows) == {"a"}, "all-NULL group must vanish"
    assert rows["a"].n_kept == 2 and rows["a"].est_distinct == 2


def test_kmv_exact_below_k(spark):
    df = spark.range(1000).select(
        F.lit("only").alias("g"), (F.col("id") % 17).alias("key")
    )
    row = kmv_distinct(df, "g", hash48(F.col("key"))).collect()[0]
    assert row.n_kept == 17 and row.est_distinct == 17
