"""Salted-join differential tests: the salted plan must produce row-identical
results to the plain join, while actually spreading the key space (the salt
column must reach the shuffle's partitioning expressions)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def skewed(spark):
    # 10k rows of key 7 (the hot key) + a uniform tail.
    hot = spark.range(10_000).select(F.lit(7).alias("k"), F.col("id").alias("payload"))
    tail = spark.range(1_000).select((F.col("id") % 50).alias("k"), F.col("id").alias("payload"))
    left = hot.unionAll(tail)
    right = spark.range(50).select(F.col("id").alias("k"), (F.col("id") * 100).alias("dim"))
    return left, right


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_matches_plain_join(skewed):
    from datafusion_distributed_experiment_spark.operators.joins import salted_join

    left, right = skewed
    plain = left.join(right, left.k == right.k, "inner")
    salted = salted_join(left, right, left.k == right.k, salt=8)
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salted_left_join_preserves_unmatched_rows(skewed):
    from datafusion_distributed_experiment_spark.operators.joins import salted_join

    left, right = skewed
    # keys >= 50 never match; left join must keep them with nulls
    left2 = left.withColumn("k", F.col("k") + 30)
    plain = left2.join(right, left2.k == right.k, "left")
    salted = salted_join(left2, right, left2.k == right.k, salt=4, how="left")
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_salt_reaches_shuffle_partitioning(skewed):
    from datafusion_distributed_experiment_spark.operators.joins import salted_join

    left, right = skewed
    spark = left.sparkSession
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = str(
            salted_join(left, right, left.k == right.k, salt=8)
            ._jdf.queryExecution()
            .executedPlan()
        )
        assert "__salt" in plan
        # the shuffle must hash on (key, salt), not the key alone
        import re

        parts = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
        assert any("__salt" in p for p in parts), parts
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_salt_determinism_across_executions(skewed):
    from datafusion_distributed_experiment_spark.operators.joins import salted_join

    left, right = skewed
    df = salted_join(left, right, left.k == right.k, salt=8)
    assert _sorted_rows(df) == _sorted_rows(df)  # rand()-based salt would flap


def test_invalid_salt_rejected(skewed):
    from datafusion_distributed_experiment_spark.operators.joins import salted_join

    left, right = skewed
    with pytest.raises(ValueError):
        salted_join(left, right, left.k == right.k, salt=0)


def test_salted_events_enrich_plan_carries_salt_conjunct(spark):
    """The declared salted query must actually join on (key AND salt): the
    salt column appears in the executed join condition and is dropped from
    the output — the static skew-spreading shape that holds when the dim
    side is too big to broadcast."""
    from datafusion_distributed_experiment_spark.operators.joins import (
        salted_events_enrich,
    )

    from .conftest import SF_DIR

    df = salted_events_enrich(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan, plan[:2000]
    assert "__salt" not in df.columns
