"""Distribution-shape parity tests.

Analogs of the reference's remaining integration tests:

- highly-distributed scan: SELECT * through chained repartition stages
  (1 -> 10 -> 5 -> 1 task fan, reference tests/highly_distributed_query.rs:29-35)
  preserves every row.
- NOT IN with nullable subquery column: three-valued-logic corner called out
  in SURVEY §7.4 — one NULL in the subquery empties the result.
- .tbl conversion CLI round trip (reference benchmarks/src/tpch/convert.rs).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_chained_repartition_preserves_rows(engine):
    """The reference's 1M-row 3-exchange fan test, as row-count parity."""
    base = engine.table("lineitem")
    n = base.count()
    fanned = base.repartition(10).repartition(5, "l_orderkey").coalesce(1)
    assert fanned.count() == n
    assert fanned.rdd.getNumPartitions() == 1


def test_repartition_hash_vs_roundrobin_same_rows(engine):
    """Round-robin and hash repartitioning produce complete partition sets
    (the two Partitioning variants the reference ships over the wire,
    reference src/plan/arrow_flight_read.rs:48-52)."""
    base = engine.table("orders").select("o_orderkey")
    rr = base.repartition(7)
    hashed = base.repartition(7, "o_orderkey")
    assert rr.count() == hashed.count() == base.count()
    # hash partitioning is value-deterministic: same key -> same partition
    parts = hashed.withColumn("pid", F.spark_partition_id())
    assert parts.groupBy("o_orderkey").agg(F.countDistinct("pid").alias("n")).filter(
        "n > 1"
    ).count() == 0


def test_not_in_with_null_subquery_is_empty(engine):
    """NOT IN over a subquery that yields a NULL selects nothing (3VL)."""
    engine.spark.sql(
        "SELECT 1 AS k UNION ALL SELECT NULL AS k"
    ).createOrReplaceTempView("with_null_keys")
    out = engine.sql(
        "SELECT COUNT(*) AS n FROM nation WHERE n_nationkey NOT IN (SELECT k FROM with_null_keys)"
    ).collect()
    assert out[0].n == 0


def test_convert_cli_roundtrip(engine, tmp_path):
    import subprocess
    import sys

    src = engine.sql("SELECT n_nationkey, n_name, n_regionkey FROM nation")
    tbl = tmp_path / "nation.tbl"
    tbl.write_text(
        "".join(f"{r.n_nationkey}|{r.n_name}|{r.n_regionkey}|\n" for r in src.collect())
    )
    out = tmp_path / "nation_pq"
    res = subprocess.run(
        [
            sys.executable,
            "/root/repo/scripts/convert.py",
            "--input",
            str(tbl),
            "--table",
            "nation",
            "--output",
            str(out),
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "wrote 25 rows" in res.stdout
