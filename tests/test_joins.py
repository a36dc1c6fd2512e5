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


# ---------------------------------------------------------------- bloom ----


def test_bloom_has_no_false_negatives(spark):
    """Every key folded into the bitmap MUST pass the membership probe —
    a bloom false negative silently drops join rows."""
    from datafusion_distributed_experiment_spark.operators.joins import (
        bloom_filter_words,
        bloom_might_contain,
    )

    keys = spark.range(0, 5_000, 7).select(F.col("id").alias("k"))
    words = bloom_filter_words(keys, "k", n_bits=1 << 14)
    missed = keys.filter(~bloom_might_contain(words, "k")).count()
    assert missed == 0


def test_bloom_actually_prunes(spark):
    """On a disjoint probe set the filter must reject the overwhelming
    majority (fpp sanity: 2 probes into a 16x-sized bitmap)."""
    from datafusion_distributed_experiment_spark.operators.joins import (
        bloom_filter_words,
        bloom_might_contain,
    )

    keys = spark.range(1_000).select(F.col("id").alias("k"))
    words = bloom_filter_words(keys, "k", n_bits=1 << 14)
    strangers = spark.range(1_000_000, 1_050_000).select(F.col("id").alias("k"))
    passed = strangers.filter(bloom_might_contain(words, "k")).count()
    assert passed / 50_000 < 0.02, f"false-positive rate {passed / 50_000:.4f}"


def test_bloom_probe_is_map_only(spark):
    """The membership probe must be a pure projection over the scan — zero
    exchanges, zero aggregates: the fact side is pruned BEFORE its join
    shuffle, which is the entire point of shipping the bitmap."""
    from datafusion_distributed_experiment_spark.operators.joins import (
        bloom_filter_words,
        bloom_might_contain,
    )
    from datafusion_distributed_experiment_spark.plans import stage_summary

    from .conftest import SF_DIR

    words = bloom_filter_words(
        spark.range(100).select(F.col("id").alias("k")), "k", n_bits=1 << 12
    )
    line = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select("l_orderkey")
    s = stage_summary(line.filter(bloom_might_contain(words, "l_orderkey")))
    assert s["exchanges"] == 0 and s["aggregates"] == 0 and s["broadcasts"] == 0, s


def test_bloom_semi_agg_empty_build_side_yields_empty_result(spark, tmp_path):
    """An all-zero bitmap (no qualifying dimension rows) must reject every
    probe row instead of erroring or passing everything."""
    from datafusion_distributed_experiment_spark.operators.joins import (
        bloom_might_contain,
    )

    words = [0] * 64
    n = spark.range(10_000).select(F.col("id").alias("k")).filter(
        bloom_might_contain(words, "k")
    ).count()
    assert n == 0


def test_salted_join_rejects_right_and_full_outer(spark):
    """Round-12 review fix: the right side is replicated salt times, so a
    right/full outer join would emit each right row's salt-1 unmatched
    replicas as spurious NULL-left rows — the documented row-identity
    contract cannot hold and the call must raise loudly."""
    import pytest

    from datafusion_distributed_experiment_spark.errors import PlanningError
    from datafusion_distributed_experiment_spark.operators.joins import salted_join

    left = spark.createDataFrame([(1, "l")], "k long, lv string")
    right = spark.createDataFrame([(1, "r"), (2, "r2")], "k long, rv string")
    for how in ("right", "rightouter", "right_outer", "full", "fullouter", "outer"):
        with pytest.raises(PlanningError, match="salted_join does not support"):
            salted_join(left, right, left["k"] == right["k"], salt=4, how=how)
    # the supported hows keep the row-identity contract
    got = sorted(
        tuple(r)
        for r in salted_join(
            left, right, left["k"] == right["k"], salt=4, how="left"
        ).collect()
    )
    assert got == [(1, "l", 1, "r")]


def test_bloom_filter_words_rejects_non_word_aligned_bits(spark):
    """Round-12 review fix: n_bits not a multiple of 64 truncated the word
    count (build-side IndexError at probe positions past the last word) and
    desynced the probe-side modulus (len(words)*64) from the build modulus
    — silent false negatives. Loud ValueError instead."""
    import pytest

    from datafusion_distributed_experiment_spark.operators.joins import (
        bloom_filter_words,
    )

    keys = spark.range(10).select(F.col("id").alias("k"))
    for bad in (0, -64, 100, 63):
        with pytest.raises(ValueError, match="multiple of 64"):
            bloom_filter_words(keys, "k", n_bits=bad)
