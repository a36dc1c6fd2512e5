"""Behavioral-analytics operators: oracle parity + the plan shapes that
make them scale (single shared exchanges, explicit pivot domain, broadcast
document frequencies)."""

from __future__ import annotations

import pytest

from datafusion_distributed_experiment_spark.operators import analytics
from datafusion_distributed_experiment_spark.plans import plan_string, stage_summary

from ._compare import assert_frames_match
from .conftest import SF_DIR


@pytest.mark.parametrize("name", sorted(analytics.queries()))
def test_analytics_matches_oracle(spark, duck, name):
    spark_df = analytics.queries()[name](spark, SF_DIR).toPandas()
    oracle_df = duck.execute(analytics.oracles()[name]).df()
    assert len(spark_df) > 0, f"{name}: empty result proves nothing"
    assert_frames_match(spark_df, oracle_df, name)


def test_funnel_shares_one_user_exchange(spark):
    """Both cascaded windows AND the final per-user aggregate must ride a
    single user_id hash exchange (same partitioning + ordering); the only
    other exchange is the output-order range partitioning."""
    df = analytics.funnel(spark, SF_DIR)
    s = stage_summary(df)
    assert s["exchanges"] == 2, s  # 1 hash on user_id + 1 output range sort
    plan = plan_string(df, "simple")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Window ") == 2, plan


def test_funnel_is_ordered(spark):
    """Stage sequencing: a later stage never precedes the first qualifying
    occurrence of the previous one, and stage times strictly increase."""
    rows = analytics.funnel(spark, SF_DIR).collect()
    for r in rows:
        if r.t_click is not None:
            assert r.t_view is not None and r.t_click > r.t_view
        if r.t_purchase is not None:
            assert r.t_click is not None and r.t_purchase > r.t_click
        done = sum(t is not None for t in (r.t_view, r.t_click, r.t_purchase))
        assert r.stages_completed == done


def test_events_pivot_has_no_distinct_collection_scan(spark):
    """The explicit pivot value list must prevent the eager values-discovery
    job: exactly ONE parquet scan in the plan (an implicit pivot plans a
    second full scan just to enumerate event types)."""
    df = analytics.events_pivot(spark, SF_DIR)
    plan = plan_string(df, "simple")
    assert plan.count("FileScan parquet") == 1, plan


def test_percentiles_reuse_the_group_partitioning(spark):
    """The rank-selection aggregate must reuse the window's event_type hash
    partitioning — one data exchange total (plus the output sort)."""
    df = analytics.events_percentiles(spark, SF_DIR)
    plan = plan_string(df, "simple")
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_percentile_ranks_are_exact_order_statistics(spark, duck):
    """p50/p90/p99 must be actual dataset values at the ceil(n*p/100)-th
    order statistic — cross-check one group against a direct sort."""
    row = (
        analytics.events_percentiles(spark, SF_DIR)
        .filter("event_type = 'click'")
        .collect()[0]
    )
    vals = [
        r[0]
        for r in duck.execute(
            "SELECT CAST(ROUND(value * 100) AS BIGINT) AS v FROM events "
            "WHERE event_type = 'click' ORDER BY v"
        ).fetchall()
    ]
    n = len(vals)
    assert row.n_events == n
    for p in analytics.PERCENTILES:
        expect = vals[(n * p + 99) // 100 - 1]
        assert row[f"p{p}_cents"] == expect, (p, n)


def test_top_terms_broadcasts_document_frequencies(spark):
    """The vocabulary-sized df table must broadcast back onto tf — the tf
    rows never reshuffle on term."""
    df = analytics.top_terms(spark, SF_DIR)
    s = stage_summary(df)
    assert s["broadcasts"] == 1, s
    plan = plan_string(df, "simple")
    assert "BroadcastHashJoin" in plan, plan


def test_top_terms_scans_the_corpus_once(spark):
    """tf feeds two branches; the checkpoint must keep the corpus scan (and
    the tokenize + (doc,term) aggregate) from running twice."""
    plan = plan_string(analytics.top_terms(spark, SF_DIR), "simple")
    assert plan.count("FileScan parquet") == 0, plan  # checkpointed RDD scan only
    assert plan.count("Scan ExistingRDD") >= 1, plan


def test_anomaly_days_flags_are_2_sigma_exact(spark):
    """Integer inequality == the real 2-sigma population test, re-derived
    with floats per user."""
    rows = analytics.anomaly_days(spark, SF_DIR).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    flagged = 0
    for days in by_user.values():
        cnts = [r.cnt for r in days]
        n = len(cnts)
        mean = sum(cnts) / n
        var = sum((c - mean) ** 2 for c in cnts) / n
        for r in days:
            expect = (r.cnt - mean) ** 2 > 4 * var + 1e-9
            assert r.is_anomaly == expect, (r, mean, var)
            flagged += r.is_anomaly
    assert flagged > 0, "fixture produced no anomalies — test is vacuous"


def test_retention_week0_has_full_cohorts(spark):
    """Every cohort retains 100% of itself at week_offset 0, and retained
    counts never exceed the cohort size."""
    rows = analytics.retention(spark, SF_DIR).collect()
    week0 = {r.cohort_week: r.n_users for r in rows if r.week_offset == 0}
    for r in rows:
        assert r.week_offset >= 0
        assert r.cohort_week in week0, r
        assert r.n_users <= week0[r.cohort_week], r


def test_unpivot_adds_no_exchange_over_pivot(spark):
    """Unpivot must plan as a map-side Expand: exchange count identical to
    the wide (pivot) plan it consumes."""
    wide = analytics.events_pivot(spark, SF_DIR)
    long = analytics.events_unpivot(spark, SF_DIR)
    # the long plan carries one extra range sort for its two-key output
    # order; hash exchanges must not grow
    wide_plan = plan_string(wide, "simple")
    long_plan = plan_string(long, "simple")
    assert long_plan.count("Exchange hashpartitioning") == wide_plan.count(
        "Exchange hashpartitioning"
    ), long_plan
    assert "Expand" in long_plan, long_plan


def test_unpivot_is_dense_inverse_of_pivot(spark):
    """Every (day, type) cell of the wide matrix appears exactly once in the
    long form, including zeros."""
    wide = {r["day"]: r for r in analytics.events_pivot(spark, SF_DIR).collect()}
    long = analytics.events_unpivot(spark, SF_DIR).collect()
    assert len(long) == len(wide) * len(analytics.EVENT_TYPES)
    for r in long:
        assert r.n == wide[r.day][f"n_{r.event_type}"]


def test_event_sequences_are_time_ordered(spark):
    """The sequence string must replay each user's events in (ts, event_id)
    order — verified against an independent driver-side sort."""
    import itertools

    from datafusion_distributed_experiment_spark.sources.events import read_events

    ev = sorted(
        (r.user_id, r.ts_ms, r.event_id, r.event_type)
        for r in read_events(spark, SF_DIR).collect()
    )
    expect = {
        uid: " ".join(t[3] for t in grp)
        for uid, grp in itertools.groupby(ev, key=lambda t: t[0])
    }
    got = {r.user_id: r.seq for r in analytics.event_sequences(spark, SF_DIR).collect()}
    assert got == expect


def test_hist_percentile_brackets_the_exact_value(spark):
    """The sketch's bin lower edge must bracket the exact rank-selected
    percentile: p_lo <= exact < p_lo + bin_width."""
    exact = {r.event_type: r for r in analytics.events_percentiles(spark, SF_DIR).collect()}
    hist = {r.event_type: r for r in analytics.events_percentiles_hist(spark, SF_DIR).collect()}
    assert set(exact) == set(hist)
    from datafusion_distributed_experiment_spark.sources.events import read_events
    from pyspark.sql import functions as F

    bounds = {
        r.event_type: (r.mn, r.mx)
        for r in read_events(spark, SF_DIR)
        .groupBy("event_type")
        .agg(F.min("value_cents").alias("mn"), F.max("value_cents").alias("mx"))
        .collect()
    }
    for et, h in hist.items():
        assert h.n_events == exact[et].n_events
        mn, mx = bounds[et]
        width = (mx - mn + 1 + analytics.HIST_BINS - 1) // analytics.HIST_BINS
        for p in analytics.PERCENTILES:
            lo = h[f"p{p}_lo_cents"]
            ex = exact[et][f"p{p}_cents"]
            assert lo <= ex <= lo + width, (et, p, lo, ex, width)


def test_hist_sketch_state_is_bin_bounded(spark):
    """The histogram never exceeds HIST_BINS rows per group — the bounded
    mergeable-state property that justifies the sketch at scale."""
    from datafusion_distributed_experiment_spark.sources.events import read_events
    from pyspark.sql import functions as F

    ev = read_events(spark, SF_DIR).select("event_type", "value_cents")
    stats = ev.groupBy("event_type").agg(
        F.min("value_cents").alias("mn"), F.max("value_cents").alias("mx")
    )
    binned = ev.join(F.broadcast(stats), "event_type").select(
        "event_type",
        F.expr(f"((value_cents - mn) * {analytics.HIST_BINS}) DIV (mx - mn + 1)").alias("bin"),
    )
    per_group = binned.groupBy("event_type").agg(
        F.countDistinct("bin").alias("nb"), F.min("bin").alias("lo"), F.max("bin").alias("hi")
    )
    for r in per_group.collect():
        assert 0 <= r.lo and r.hi < analytics.HIST_BINS
        assert r.nb <= analytics.HIST_BINS


def test_sessionize_native_agrees_with_lag_sessionizer(spark):
    """Same gap, two plans (native session_window aggregate vs lag-window
    cascade): both merge on inter-event diff <= gap (the boundary suite
    pins the native operator's exactly-gap case to MERGE, matching the lag
    form's strict `> gap` split), so session intervals match 1:1 with the
    native end shifted by the gap."""
    from datafusion_distributed_experiment_spark.streaming.stateful import user_sessions

    native = {
        (r.user_id, r.start_ms): (r.end_gap_ms, r.n_events)
        for r in analytics.sessionize_native(spark, SF_DIR).collect()
    }
    lag = {
        (r.user_id, r.start_ms): (r.end_ms + analytics.SESSION_GAP_MS, r.n_events)
        for r in user_sessions(spark, SF_DIR).collect()
    }
    assert native == lag


def test_sessionize_native_plans_a_session_window_aggregate(spark):
    """The native operator must plan session-window merging state (a
    distinct physical shape from the window-function cascade)."""
    plan = plan_string(analytics.sessionize_native(spark, SF_DIR), "simple")
    assert "session_window" in plan or "SessionWindow" in plan, plan


def test_basket_pairs_never_self_joins_the_fact_table(spark):
    """Pair generation must be the basket-array explode, not a lineitem
    self-join: exactly one scan of lineitem in the plan."""
    df = analytics.basket_pairs(spark, SF_DIR)
    plan = plan_string(df, "simple")
    assert plan.count("FileScan parquet") == 1, plan
    assert "Join" not in plan, plan  # no join operator at all


def test_basket_pairs_support_is_replayable(spark, duck):
    """Each reported pair's support must equal a direct count of orders
    containing both parts."""
    rows = analytics.basket_pairs(spark, SF_DIR).collect()
    assert rows
    for r in rows[:5]:
        n = duck.execute(
            """
            SELECT COUNT(*) FROM (
              SELECT l_orderkey FROM lineitem WHERE l_partkey = ? INTERSECT
              SELECT l_orderkey FROM lineitem WHERE l_partkey = ?)
            """,
            [r.part_a, r.part_b],
        ).fetchone()[0]
        assert r.support == n, r


def test_rollup_incremental_pushes_the_delta_day_filter(spark):
    """The delta branch must reach the parquet scan as a pushed predicate —
    at scale with day-partitioned layout that filter prunes to ONE
    partition; an unpushed filter would re-scan all history."""
    from datafusion_distributed_experiment_spark.plans import pushed_filters

    df = analytics.rollup_incremental(spark, SF_DIR)
    filters = " ".join(pushed_filters(df))
    # the raw-ts comparisons must reach the scan (a derived-day filter
    # would leave only IsNotNull here)
    assert "GreaterThanOrEqual(ts" in filters or "GreaterThan(ts" in filters, filters
    assert "LessThan(ts" in filters, filters


def test_rollup_incremental_equals_full_recompute(spark):
    from pyspark.sql import functions as F

    from datafusion_distributed_experiment_spark.sources.events import read_events

    full = {
        r.event_type: (r.n, r.c)
        for r in read_events(spark, SF_DIR)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("value_cents").alias("c"))
        .collect()
    }
    inc = {
        r.event_type: (r.n_events, r.total_cents)
        for r in analytics.rollup_incremental(spark, SF_DIR).collect()
    }
    assert inc == full
