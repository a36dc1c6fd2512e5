"""CDC merge: upsert/delete semantics, snapshot-map-only plan shape, and
oracle-strength wiring for the declared query."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_distributed_experiment_spark.operators.cdc import (
    OP_COL,
    cdc_apply_changes,
    cdc_merge,
)


def _merge(spark, snapshot_rows, change_rows):
    snap = spark.createDataFrame(snapshot_rows, "k long, seg string, v long")
    chg = spark.createDataFrame(change_rows, f"k long, seg string, v long, {OP_COL} string")
    out = cdc_merge(snap, chg, key="k")
    return sorted((r["k"], r["seg"], r["v"]) for r in out.collect())


def test_cdc_merge_semantics(spark):
    snapshot = [(1, "a", 10), (2, "b", 20), (3, "c", 30)]
    changes = [
        (2, "b2", 99, "U"),   # update replaces every non-key column
        (3, None, 0, "D"),    # delete removes the key
        (7, "n", 70, "I"),    # insert appends
    ]
    assert _merge(spark, snapshot, changes) == [(1, "a", 10), (2, "b2", 99), (7, "n", 70)]


def test_cdc_merge_empty_changes_is_identity(spark):
    snapshot = [(1, "a", 10), (2, "b", 20)]
    assert _merge(spark, snapshot, []) == [(1, "a", 10), (2, "b", 20)]


def test_cdc_merge_update_missing_key_is_noop_and_delete_unknown_too(spark):
    """A 'U' for a key absent from the snapshot matches nothing (MERGE
    WHEN MATCHED semantics); a 'D' for an unknown key removes nothing."""
    snapshot = [(1, "a", 10)]
    changes = [(9, "x", 1, "U"), (8, "y", 2, "D")]
    assert _merge(spark, snapshot, changes) == [(1, "a", 10)]


def test_cdc_snapshot_side_is_map_only(spark):
    """The snapshot must reach the merge without shuffling: change ops are a
    broadcast lookup (the daily-batch asymmetry — at 100 TB the snapshot
    scan is the whole cost and it happens once, map-side). The only
    non-broadcast exchanges allowed are the presentation sort (range) and
    the DELTA-SIZED hash exchanges feeding the duplicate-key guard windows
    on the change-batch lineage (round-13 loud-contract addition) — never
    anything on the snapshot's path to the join."""
    import re

    from .conftest import SF_DIR

    df = cdc_apply_changes(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:2000]
    shuffles = [
        line
        for line in plan.splitlines()
        if "Exchange" in line and "Broadcast" not in line and "Reused" not in line
    ]
    bad = [
        s
        for s in shuffles
        if "rangepartitioning" not in s.lower() and "hashpartitioning" not in s.lower()
    ]
    assert not bad, bad
    # every hash exchange is a dup-guard window's requirement on the
    # change batch — one Window per hash exchange, nothing else
    assert plan.count("hashpartitioning") == plan.count("Window [count(1)"), plan[:3000]
    # the snapshot reaches the join as the STREAMED child with no
    # exchange in between: every line between the BHJ and its build-side
    # BroadcastExchange (the streamed subtree) is exchange-free
    lines = plan.splitlines()
    bhj = next(i for i, line in enumerate(lines) if "BroadcastHashJoin" in line)
    bex = next(
        i for i, line in enumerate(lines) if i > bhj and "BroadcastExchange" in line
    )
    streamed = lines[bhj + 1 : bex]
    assert streamed and not any("Exchange" in s for s in streamed), streamed


def test_cdc_apply_changes_end_to_end_counts(spark):
    """Deterministic change-batch arithmetic: |out| = |base| - |deletes| +
    |inserts|, new keys live in NEWSEG, deleted keys are gone."""
    from .conftest import SF_DIR

    base = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    n = base.count()
    n_del = base.filter(F.col("c_custkey") % 10 == 0).count()
    n_ins = base.filter(F.col("c_custkey") % 10 == 3).count()
    out = cdc_apply_changes(spark, SF_DIR)
    assert out.count() == n - n_del + n_ins
    assert out.filter(F.col("c_mktsegment") == "NEWSEG").count() == n_ins
    assert out.filter(F.col("c_custkey") % 10 == 0).filter(
        F.col("c_custkey") < 1_000_000
    ).count() == 0


def test_profile_columns_counts_nulls_and_distincts(spark):
    from datafusion_distributed_experiment_spark.operators.profile import (
        profile_columns,
    )

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, "b"), (None, None)],
        "k int, s string",
    )
    got = {
        r["column"]: (r["n_rows"], r["n_nulls"], r["n_distinct"])
        for r in profile_columns(df, ["k", "s"]).collect()
    }
    assert got == {"k": (5, 2, 3), "s": (5, 2, 2)}


def test_profile_columns_batches_past_expand_width(spark):
    """Wider than PROFILE_BATCH_COLUMNS, the profile splits into one
    bounded-Expand aggregate per batch (B scans instead of a width-of-table
    row multiplication) with identical per-column answers."""
    from pyspark.sql import functions as F

    from datafusion_distributed_experiment_spark.operators.profile import (
        PROFILE_BATCH_COLUMNS,
        profile_columns,
    )

    width = PROFILE_BATCH_COLUMNS + 3
    df = spark.range(40).select(
        *[(F.col("id") % (i + 2)).alias(f"c{i:02d}") for i in range(width)]
    )
    wide = profile_columns(df, [f"c{i:02d}" for i in range(width)])
    got = {
        r["column"]: (r["n_rows"], r["n_nulls"], r["n_distinct"]) for r in wide.collect()
    }
    assert len(got) == width
    for i in range(width):
        assert got[f"c{i:02d}"] == (40, 0, min(i + 2, 40))
    # the batched path really ran: more than one aggregate scan in the plan
    plan = wide._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Range (0, 40") >= 2, plan[:1500]


def test_profile_is_single_aggregate_pass(spark):
    """All per-column statistics come from ONE aggregate over the table
    (Expand-based multi-distinct), not a scan per column."""
    from datafusion_distributed_experiment_spark.operators.profile import table_profile
    from .conftest import SF_DIR

    plan = table_profile(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    # "FileScan parquet" contains "Scan parquet"; count the common substring
    assert plan.count("Scan parquet") <= 1, plan[:2000]
    # multi-distinct planned through one grouped pass (Expand/gid FILTERs),
    # partial+final split around a single exchange
    assert "gid" in plan and "partial_count" in plan, plan[:2000]


def test_cdc_update_to_null_replaces(spark):
    """Round-12 review fix: 'U' rows are WHOLE-ROW images — an update that
    legitimately sets a value column to NULL must replace it, not keep the
    old value (the COALESCE spelling silently kept it, identically in both
    engines, so the oracle could never see it)."""
    snapshot = [(1, "a", 10), (2, "b", 20)]
    changes = [(1, None, 99, "U")]
    assert _merge(spark, snapshot, changes) == [(1, None, 99), (2, "b", 20)]


def test_cdc_unknown_op_raises(spark):
    """Round-12 review fix: rows whose __op is NULL or outside {'I','U','D'}
    (lowercase 'u', 'UPDATE', schema drift) previously vanished from BOTH
    the upsert and insert paths — a silently incomplete merge. They raise
    loudly. Round-13 review fix: the check is a raise_error CASE riding the
    merge's own evaluation (not an eager limit(1) pre-pass that evaluated
    the change lineage twice and could pass on a nondeterministic source
    yet merge different rows), so it surfaces at ACTION time on the
    executor->driver path; errors.map_exception types it ExecutionError
    with the message intact."""
    import pytest

    from datafusion_distributed_experiment_spark.errors import (
        ExecutionError,
        map_exception,
    )

    snapshot = [(1, "a", 10)]
    for bad_op in ("u", "UPDATE", None):
        with pytest.raises(Exception, match="unknown __op") as excinfo:
            _merge(spark, snapshot, [(1, "x", 1, bad_op)])
        mapped = map_exception(excinfo.value)
        assert isinstance(mapped, ExecutionError)
        assert "unknown __op" in str(mapped)
        # the offending value itself crosses the boundary (NULL spelled out)
        assert (bad_op or "NULL") in str(mapped)


def test_cdc_unknown_op_check_adds_no_extra_job(spark):
    """The inline validation must not run a driver-side job at cdc_merge()
    call time — the round-12 advisory's cost complaint. Building the merge
    plan over a VALID batch triggers zero Spark jobs; the single action
    evaluates check and merge together."""
    snap = spark.createDataFrame([(1, "a", 10)], "k long, seg string, v long")
    chg = spark.createDataFrame(
        [(1, "b", 11, "U")], f"k long, seg string, v long, {OP_COL} string"
    )
    sc = spark.sparkContext
    sc.setJobGroup("cdc-lazy-check", "assert cdc_merge runs no eager job")
    try:
        out = cdc_merge(snap, chg, key="k")  # plan-building only
        jobs = sc.statusTracker().getJobIdsForGroup("cdc-lazy-check")
    finally:
        sc.setJobGroup(None, None)
    assert not jobs, f"cdc_merge must be lazy — eager validation jobs ran: {jobs}"
    assert sorted((r["k"], r["seg"], r["v"]) for r in out.collect()) == [(1, "b", 11)]


def test_cdc_insert_keys_never_collide_with_snapshot(spark):
    """Round-12 review fix: insert keys offset by MAX(c_custkey), not a
    fixed 1_000_000 (which collided with genuine keys once the table passed
    ~1M rows, emitting duplicate primary keys in BOTH spellings). The
    merged snapshot's keys must be unique, and every inserted key must
    exceed every original key."""
    from .conftest import SF_DIR

    out = cdc_apply_changes(spark, SF_DIR)
    keys = [r["c_custkey"] for r in out.select("c_custkey").collect()]
    assert len(keys) == len(set(keys)), "merged snapshot must have unique keys"
    base_max = (
        spark.read.parquet(f"{SF_DIR}/customer.parquet")
        .agg(F.max("c_custkey"))
        .collect()[0][0]
    )
    inserted = [
        r["c_custkey"]
        for r in out.filter(F.col("c_mktsegment") == "NEWSEG").collect()
    ]
    assert inserted and all(k > base_max for k in inserted)


def test_cdc_duplicate_change_key_raises(spark):
    """Round-13 review fix: the compacted-batch contract ("at most one
    change row per key") was prose, not code — a duplicate 'U' silently
    DOUBLE-APPLIED (two joined rows per snapshot key), duplicate 'I' rows
    inserted a duplicate primary key, identically invisible to any oracle
    derived from the same batch. The count-over-key guard rides the
    merge's own evaluation and raises loudly."""
    import pytest

    snapshot = [(1, "a", 10), (2, "b", 20)]
    dup_batches = [
        [(1, "x", 1, "U"), (1, "y", 2, "U")],   # double update
        [(9, "x", 1, "I"), (9, "y", 2, "I")],   # duplicate insert key
        [(1, "x", 1, "U"), (1, None, None, "D")],  # update + delete same key
        [(1, None, None, "D"), (1, None, None, "D")],  # double delete
        [(1, "x", 1, "U"), (1, "y", 2, "I")],   # update + insert same key
    ]
    for batch in dup_batches:
        with pytest.raises(Exception, match="DUPLICATE rows for key"):
            _merge(spark, snapshot, batch)
    # distinct keys across ops still merge fine
    ok = _merge(spark, snapshot, [(1, "x", 1, "U"), (2, None, None, "D"), (3, "c", 30, "I")])
    assert ok == [(1, "x", 1), (3, "c", 30)]


def test_cdc_delete_then_reinsert_pair_is_accepted(spark):
    """Round-14 review fix: the round-13 duplicate-key guard
    over-tightened the public contract — a {D, I} pair for one key is the
    standard delete-then-reinsert sequence an uncompacted CDC feed emits
    for a key replacement, and it composes safely in this dataflow (D
    removes the snapshot row, I appends the new image) regardless of row
    order. Accepted in BOTH orders — DELIBERATELY: the batch carries no
    sequence column, so insert-then-retract (net absent) is
    indistinguishable and the contract documents that such feeds must
    compact upstream; this test pins the resurrection interpretation so
    the choice can never drift silently. Richer combos still raise
    (pinned in test_cdc_duplicate_change_key_raises)."""
    snapshot = [(1, "a", 10), (2, "b", 20)]
    want = [(1, "z", 99), (2, "b", 20)]
    di = _merge(spark, snapshot, [(1, None, None, "D"), (1, "z", 99, "I")])
    assert di == want
    id_ = _merge(spark, snapshot, [(1, "z", 99, "I"), (1, None, None, "D")])
    assert id_ == want
