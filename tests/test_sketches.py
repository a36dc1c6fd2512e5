"""Count-min sketch: the one-sided error guarantee on real data, and the
mergeability property the distributed build relies on (cell-wise addition of
partition-local sketches == the global sketch).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from datafusion_distributed_experiment_spark.operators.sketches import (
    CMS_D,
    CMS_W,
    cms_heavy_hitters,
    hll_distinct,
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


# ------------------------------------------------------------------ #
# HyperLogLog
# ------------------------------------------------------------------ #


def test_hll_bitlen_ladder_matches_python():
    """The generated comparison ladder IS the cross-engine contract: check
    it against int.bit_length over the edge values (0, powers of two, their
    neighbors, the full-width max) on DuckDB — no JVM needed."""
    import duckdb

    from datafusion_distributed_experiment_spark.operators.sketches import (
        _HLL_W_BITS,
        _bitlen_ladder,
    )

    W = _HLL_W_BITS
    vals = sorted(
        {0, 1, 2, 3, (1 << W) - 1}
        | {1 << b for b in range(1, W)}
        | {(1 << b) - 1 for b in range(2, W + 1)}
        | {(1 << b) + 1 for b in range(1, W - 1)}
    )
    con = duckdb.connect()
    got = con.execute(
        "SELECT v, " + _bitlen_ladder("v") + " AS bl FROM (SELECT UNNEST(?) AS v)",
        [vals],
    ).fetchall()
    for v, bl in got:
        assert bl == int(v).bit_length(), (v, bl)


def test_hll_linear_counting_kicks_in_below_threshold(spark):
    """At sf0.001 the per-type distinct-user count is tiny, so the raw HLL
    estimate sits below 2.5*m and the linear-counting branch must produce
    an estimate close to exact (within the classic LC error band), never
    the raw estimator's small-range bias."""
    rows = hll_distinct(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_zero_registers"] > 0
        # exact is tiny -> LC estimate tight (1024-register LC at n~15 is near-exact)
        assert abs(r["est_distinct"] - r["exact_distinct"]) <= max(
            5, r["exact_distinct"] // 3
        ), r


def test_hll_registers_merge_to_global(spark):
    """Mergeability: register MAX is associative/commutative, so 1 vs 8
    shuffle partitions must produce the identical sketch — the property
    that lets partial sketches combine map-side at 1000 executors."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        single = sorted(map(tuple, hll_distinct(spark, SF_DIR).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        merged = sorted(map(tuple, hll_distinct(spark, SF_DIR).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert single == merged


def test_hll_state_is_bounded(spark):
    """Per-key register table never exceeds HLL_M rows per key."""
    from pyspark.sql import functions as F

    from datafusion_distributed_experiment_spark.operators.sketches import HLL_M

    regs = hll_distinct(spark, SF_DIR)
    # n_zero_registers in [0, m]; nonzero registers = m - zeros
    for r in regs.collect():
        assert 0 <= r["n_zero_registers"] <= HLL_M


def test_hll_is_duplication_invariant(spark):
    """Register MAX is idempotent: the sketch over the event multiset must
    equal the sketch over the distinct (event_type, user) set — cardinality
    estimation cannot be inflated by repeated observations (the property
    a COUNT-based estimator lacks)."""
    from pyspark.sql import functions as F

    from datafusion_distributed_experiment_spark.sources.events import read_events

    ev = read_events(spark, SF_DIR).select("event_type", "user_id")
    full = {
        (r["event_type"], r["est_distinct"])
        for r in hll_distinct(spark, SF_DIR).collect()
    }
    # rebuild the estimate over the doubled stream via a temp view the
    # operator reads: duplicate every event and compare per-type estimates
    doubled = ev.unionAll(ev)
    assert doubled.count() == 2 * ev.count()
    # the sketch itself: replicate the operator's register math inline
    from datafusion_distributed_experiment_spark.operators.sketches import (
        _HLL_W_BITS,
        _SPARK_INDEX,
        _bitlen_ladder,
        _hll_est_sql,
        HLL_M,
        HLL_RHO_CAP,
    )
    from datafusion_distributed_experiment_spark.operators.temporal import hash48

    h = doubled.select(
        "event_type", hash48(F.col("user_id")).alias("h")
    ).select(
        "event_type",
        (F.col("h") % HLL_M).alias("bucket"),
        F.col("h").cast("long").alias("h"),
    )
    regs = (
        h.select(
            "event_type",
            "bucket",
            F.expr(
                f"{_HLL_W_BITS + 1} - ({_bitlen_ladder(f'(h DIV {HLL_M})')})"
            ).alias("rho"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("m_j"))
    )
    sk = regs.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_buckets"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_RHO_CAP} - m_j)"))
        .cast("long")
        .alias("sum_nz"),
    )
    est2 = {
        (r["event_type"], r["est"])
        for r in sk.select(
            "event_type",
            F.expr(f"CAST({_hll_est_sql('DIV', _SPARK_INDEX)} AS BIGINT)").alias("est"),
        ).collect()
    }
    assert est2 == full


def test_weighted_sample_prefers_heavy_documents():
    """Weight-proportionality: P(include) = min(1, w/tau) under priority
    sampling, so with weights 1 vs 100 the heavy class must dominate the
    sample. Replayed in pure Python with the operator's exact integer
    priority (md5-slice-driven u — magnitude-uniform, which poly_hash is
    NOT: its magnitude encodes the id string's length, the bias this very
    test caught), on a wide-spread fixture where the signal decisively
    beats the u-noise."""
    import hashlib

    from datafusion_distributed_experiment_spark.operators.curation import (
        _WSAMPLE_HASH_HEX,
        _WSAMPLE_HASH_MOD,
    )

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:_WSAMPLE_HASH_HEX], 16)

    items = [(i, 1 if i < 1000 else 100) for i in range(2000)]
    pri = sorted(
        ((w * _WSAMPLE_HASH_MOD) // (h(str(i)) + 1), i, w) for i, w in items
    )[::-1][:200]
    heavy = sum(1 for _, _, w in pri if w == 100)
    # expected ~= all 200 heavy (inclusion odds 100:1); allow wide slack
    assert heavy >= 180, heavy


@given(
    ids=st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=400)
)
@settings(max_examples=25, deadline=None)
def test_hll_oracle_sql_matches_python_replica(ids):
    """Algorithm-level proof for the generated estimator SQL (the
    cross-engine test proves Spark == DuckDB; this proves the shared SQL
    equals HyperLogLog itself): a pure-Python replay of hash48 -> bucket ->
    rho -> registers -> integer alpha estimate -> linear-counting branch
    must reproduce the DuckDB oracle row on arbitrary id multisets. No JVM
    needed — the oracle SQL runs on a constructed events table."""
    import hashlib
    import math

    import duckdb

    from datafusion_distributed_experiment_spark.operators.sketches import (
        _HLL_LC_THRESHOLD,
        _HLL_W_BITS,
        HLL_ALPHA_X,
        HLL_M,
        HLL_RHO_CAP,
        oracles,
    )

    # ---- python replica ----
    regs: dict[int, int] = {}
    for u in ids:
        h = int(hashlib.md5(str(u).encode()).hexdigest()[:12], 16)
        w = h // HLL_M
        rho = _HLL_W_BITS + 1 - w.bit_length()
        b = h % HLL_M
        regs[b] = max(regs.get(b, 0), rho)
    sum_nz = sum(1 << (HLL_RHO_CAP - m) for m in regs.values())
    nb = len(regs)
    raw = (
        HLL_ALPHA_X
        * ((HLL_M * HLL_M * (1 << HLL_RHO_CAP)) // (sum_nz + (HLL_M - nb) * (1 << HLL_RHO_CAP)))
        // 1000
    )
    zeros = HLL_M - nb
    if raw <= _HLL_LC_THRESHOLD and zeros > 0:
        want_est = round(HLL_M * math.log(HLL_M / zeros))
    else:
        want_est = raw

    con = duckdb.connect()
    con.execute("CREATE TABLE events AS SELECT 'x' AS event_type, UNNEST(?) AS user_id", [ids])
    row = con.execute(oracles()["hll_distinct"]).fetchall()[0]
    assert row[1] == zeros
    assert row[2] == want_est, (row[2], want_est, zeros, raw)
    assert row[3] == len(set(ids))


def test_cms_heavy_flag_headroom_guard():
    """Trip + pass paths of the cross-multiplication guard (the
    pagerank/bm25/dsir pattern)."""
    import pytest

    from datafusion_distributed_experiment_spark.errors import PlanningError
    from datafusion_distributed_experiment_spark.operators.sketches import (
        check_heavy_flag_headroom,
    )

    check_heavy_flag_headroom(10**12, 10**6)  # 1T events, 1M users: fine
    with pytest.raises(PlanningError, match="int64 headroom"):
        check_heavy_flag_headroom(10**12, 10**9)
    # n_users = 1: the RIGHT side (n_events * HH_NUM) is the binding bound
    # — the old left-side-only guard passed this and Spark would wrap
    from datafusion_distributed_experiment_spark.operators.sketches import HH_NUM

    i64 = 2**63 - 1
    check_heavy_flag_headroom(i64 // HH_NUM, 1)
    with pytest.raises(PlanningError, match="int64 headroom"):
        check_heavy_flag_headroom(i64 // HH_NUM + 1, 1)


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_hll_relative_error_stays_in_published_band(spark, sf_dir):
    """Accuracy envelope ON DATA, at both verification scales (round-8
    verdict task): the estimator's own oracle only proves Spark == DuckDB —
    a hash or bitlen-ladder edit could degrade ACCURACY while still
    hash-matching its twin. HyperLogLog's published asymptotic stderr is
    1.04/sqrt(m) ~= 3.25% at m=1024 (linear-counting regime tighter);
    pin every key inside a 3-sigma ~10% envelope and the mean inside
    ~1.6-sigma 5% (measured today: +2% at sf0.01, +4.7% worst-key at
    sf0.1 — a regression past these bands is an algorithm break, not
    noise)."""
    rows = hll_distinct(spark, sf_dir).collect()
    assert rows, "no event types"
    errs = [
        abs(r["est_distinct"] - r["exact_distinct"]) / r["exact_distinct"]
        for r in rows
    ]
    assert max(errs) <= 0.10, [
        (r["event_type"], r["est_distinct"], r["exact_distinct"]) for r in rows
    ]
    assert sum(errs) / len(errs) <= 0.05, errs


def test_domain_profile_shard_merge_equals_direct_sketch(spark):
    """Register-wise MAX is HyperLogLog's merge operator: the per-shard
    partial sketches merged across the aggregation boundary must produce
    EXACTLY the register table (and therefore the estimate) of an
    unsharded build over the same tokens. This is the property
    domain_token_profile exists to exercise — and the algorithm-level
    check its shared-dataflow DuckDB twin cannot provide (both engines
    run the same two-level dataflow; only this direct-vs-merged
    differential would catch a merge that loses register mass)."""
    from pyspark.sql import functions as F

    from datafusion_distributed_experiment_spark.functions.text import tokens
    from datafusion_distributed_experiment_spark.operators.sketches import (
        HLL_M,
        _HLL_W_BITS,
        _bitlen_ladder,
        domain_token_profile,
    )
    from datafusion_distributed_experiment_spark.operators.temporal import hash48

    from .conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("source", "text")
    direct = (
        docs.select("source", F.explode(tokens(F.col("text"))).alias("tok"))
        .select("source", hash48(F.col("tok")).alias("h"))
        .select(
            "source",
            (F.col("h") % HLL_M).alias("bucket"),
            F.expr(
                f"{_HLL_W_BITS + 1} - ({_bitlen_ladder(f'(h DIV {HLL_M})')})"
            ).alias("rho"),
        )
        .groupBy("source", "bucket")
        .agg(F.max("rho").alias("m_j"))
    )
    # rebuild the merged registers the operator aggregates internally
    from datafusion_distributed_experiment_spark.operators.sketches import (
        PROFILE_SHARDS,
    )

    sharded = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select(
            "source",
            (F.col("doc_id") % PROFILE_SHARDS).alias("shard"),
            F.explode(tokens(F.col("text"))).alias("tok"),
        )
        .select("source", "shard", hash48(F.col("tok")).alias("h"))
        .select(
            "source",
            "shard",
            (F.col("h") % HLL_M).alias("bucket"),
            F.expr(
                f"{_HLL_W_BITS + 1} - ({_bitlen_ladder(f'(h DIV {HLL_M})')})"
            ).alias("rho"),
        )
        .groupBy("source", "shard", "bucket")
        .agg(F.max("rho").alias("m_j"))
        .groupBy("source", "bucket")
        .agg(F.max("m_j").alias("m_j"))
    )
    d = {(r["source"], r["bucket"]): r["m_j"] for r in direct.collect()}
    m = {(r["source"], r["bucket"]): r["m_j"] for r in sharded.collect()}
    assert d == m
    # and the profile's estimate respects the hll accuracy envelope on data
    rows = domain_token_profile(spark, SF_DIR).collect()
    assert rows
    errs = [
        abs(r["est_distinct_tokens"] - r["exact_distinct_tokens"])
        / r["exact_distinct_tokens"]
        for r in rows
    ]
    assert max(errs) <= 0.10, [
        (r["source"], r["est_distinct_tokens"], r["exact_distinct_tokens"])
        for r in rows
    ]


def test_domain_profile_weight_arithmetic(spark):
    """The diversity weight recomputes from the row's own integer columns
    (floor(1e6 * div_share / greatest(share, 1))) and the two share columns
    sum to ~1e6 — the domain_mix ppm-floor contract carried over. The
    greatest(·, 1) clamp keeps the replay total (share_ppm floors to 0 for
    any source under 1 ppm of corpus token mass)."""
    from datafusion_distributed_experiment_spark.operators.sketches import (
        domain_token_profile,
    )

    from .conftest import SF_DIR

    rows = domain_token_profile(spark, SF_DIR).collect()
    assert rows
    n = len(rows)
    for r in rows:
        assert r["weight_ppm"] == (10**6 * r["div_share_ppm"]) // max(r["share_ppm"], 1)
    for col in ("share_ppm", "div_share_ppm"):
        total = sum(r[col] for r in rows)
        assert 10**6 - n <= total <= 10**6, (col, total)


def test_domain_profile_checkpoints_the_multi_consumer_profile(spark):
    """The profile table feeds both sides of the totals cross join; without
    the sources-sized localCheckpoint the whole sketch subtree executes
    once per consumer (measured: 6 corpus scans instead of 3). The
    returned plan reading ZERO parquet pins the checkpoint in place."""
    from datafusion_distributed_experiment_spark.operators.sketches import (
        domain_token_profile,
    )

    from .conftest import SF_DIR

    df = domain_token_profile(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FileScan parquet" not in plan, plan[:2000]
    assert "Scan ExistingRDD" in plan, plan[:2000]


def _qsketch_rows(spark, n_groups=3, n_rows=4000):
    """Constructed fact table with >> QSKETCH_K rows per group and a KNOWN
    value distribution (value_cents == rank within group), so true
    percentiles are analytic and the approximation path — not the
    exact-small-group path — is what the assertions exercise."""
    from pyspark.sql import functions as F

    return (
        spark.range(n_groups * n_rows)
        .select(
            F.concat(F.lit("t"), (F.col("id") % n_groups).cast("string")).alias(
                "event_type"
            ),
            F.col("id").alias("event_id"),
            (F.col("id") / n_groups).cast("long").alias("value_cents"),
        )
    )


def test_quantile_sketch_merge_equals_direct_sample(spark):
    """Bottom-k by hash is associative: the two-level (per-shard bottom-k,
    then bottom-k of the union) sample must retain EXACTLY the rows of a
    direct single-level bottom-k over the same data — the mergeability
    property that lets partial sketches ship from every shard of a 100 TB
    corpus and combine loss-free (HLL's register-max argument, in min-k
    form). This is the algorithm-level check the shared-dataflow DuckDB
    twin cannot provide."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from datafusion_distributed_experiment_spark.operators.sketches import (
        QSKETCH_K,
        quantile_sketch_sample,
    )
    from datafusion_distributed_experiment_spark.operators.temporal import hash48

    rows = _qsketch_rows(spark)
    two_level = quantile_sketch_sample(rows)
    w = Window.partitionBy("event_type").orderBy("h", "event_id")
    direct = (
        rows.select(
            "event_type", "event_id", hash48(F.col("event_id")).alias("h")
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= QSKETCH_K)
    )
    got = {(r["event_type"], r["event_id"]) for r in two_level.collect()}
    want = {(r["event_type"], r["event_id"]) for r in direct.collect()}
    assert got == want
    # full state: every group has >= QSKETCH_K rows here
    per_group: dict[str, int] = {}
    for t, _ in got:
        per_group[t] = per_group.get(t, 0) + 1
    assert all(v == QSKETCH_K for v in per_group.values()), per_group


def test_quantile_sketch_estimates_within_rank_envelope(spark):
    """Exact-bracket envelope on constructed data (value == within-group
    rank, so true percentile values are analytic): each estimate's TRUE
    rank must sit within +-10 percentage points of the target — k=512
    gives ~4.4 ppt sampling s.d., so the 10 ppt envelope is ~2.3 sigma per
    (group, percentile). Catches any systematic bias (the r7 poly-hash
    magnitude lesson) that the cross-engine oracle, replaying the same
    dataflow, would reproduce rather than expose."""
    import datafusion_distributed_experiment_spark.operators.sketches as sk
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = _qsketch_rows(spark)
    n_rows = 4000
    sample = sk.quantile_sketch_sample(rows)
    ws = Window.partitionBy("event_type").orderBy("value_cents", "event_id")
    wp = Window.partitionBy("event_type")
    ranked = sample.select(
        "event_type",
        "value_cents",
        F.row_number().over(ws).alias("srn"),
        F.count("*").over(wp).alias("sk"),
    )
    est = ranked.groupBy("event_type").agg(
        *[
            F.max(
                F.when(F.expr(f"srn = (sk * {p} + 99) DIV 100"), F.col("value_cents"))
            ).alias(f"p{p}")
            for p in sk.QSKETCH_PERCENTILES
        ]
    )
    for r in est.collect():
        for p in sk.QSKETCH_PERCENTILES:
            true_rank_pct = 100.0 * (r[f"p{p}"] + 1) / n_rows
            assert abs(true_rank_pct - p) <= 10.0, (r["event_type"], p, r[f"p{p}"])


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"])
def test_quantile_sketch_rank_envelope_on_data(spark, sf_dir):
    """Accuracy envelope ON DATA at both scales where the approximation
    path is live (groups of ~2k / ~20k rows >> k=512, so estimates come
    from the sampled regime, unlike sf0.001's exact-below-k groups) — the
    hll_relative_error companion for the rank sketch, added at its
    round-11 promotion. Each estimate's TRUE rank bracket (ties handled
    exactly: [count(< est), count(<= est)] as percentages) must overlap
    the target within +-10 ppt — ~4.5 sigma at p50 for k=512. A breach is
    an algorithm break (biased hash, broken merge), not sampling noise."""
    from pyspark.sql import functions as F

    from datafusion_distributed_experiment_spark.operators.sketches import (
        QSKETCH_PERCENTILES,
        events_quantile_sketch,
    )
    from datafusion_distributed_experiment_spark.sources.events import read_events

    est = events_quantile_sketch(spark, sf_dir)
    ev = read_events(spark, sf_dir).select("event_type", "value_cents")
    joined = ev.join(F.broadcast(est), "event_type")
    brackets = joined.groupBy("event_type").agg(
        F.count("*").alias("n"),
        *[
            agg
            for p in QSKETCH_PERCENTILES
            for agg in (
                F.sum(
                    (F.col("value_cents") < F.col(f"p{p}_est_cents")).cast("long")
                ).alias(f"lo{p}"),
                F.sum(
                    (F.col("value_cents") <= F.col(f"p{p}_est_cents")).cast("long")
                ).alias(f"hi{p}"),
            )
        ],
    )
    rows = brackets.collect()
    assert rows, "no event types"
    for r in rows:
        assert r["n"] > 512, "approximation path not live at this scale"
        for p in QSKETCH_PERCENTILES:
            lo_pct = 100.0 * r[f"lo{p}"] / r["n"]
            hi_pct = 100.0 * r[f"hi{p}"] / r["n"]
            assert lo_pct <= p + 10.0 and hi_pct >= p - 10.0, (
                r["event_type"],
                p,
                lo_pct,
                hi_pct,
            )


def test_quantile_sketch_exact_below_k_and_output_contract(spark):
    """A group smaller than QSKETCH_K retains ALL its rows, so the sketch's
    estimates must EQUAL events_percentiles' exact values there — true for
    every event type at sf0.001 iff sample_k == n_events; where the group
    exceeds k, sample_k must clamp at k."""
    from datafusion_distributed_experiment_spark.operators.analytics import (
        events_percentiles,
    )
    from datafusion_distributed_experiment_spark.operators.sketches import (
        QSKETCH_K,
        events_quantile_sketch,
    )

    exact = {r["event_type"]: r for r in events_percentiles(spark, SF_DIR).collect()}
    for r in events_quantile_sketch(spark, SF_DIR).collect():
        e = exact[r["event_type"]]
        assert r["n_events"] == e["n_events"]
        if r["n_events"] <= QSKETCH_K:
            assert r["sample_k"] == r["n_events"]
            for p in (50, 90, 99):
                assert r[f"p{p}_est_cents"] == e[f"p{p}_cents"], (r, e)
        else:
            assert r["sample_k"] == QSKETCH_K


def test_quantile_sketch_sample_matches_python_replica(spark):
    """Pure-Python replica of the bottom-k selection on the REAL events
    table: hashlib.md5 hex-slice (the hash48 contract), shard split,
    per-(type, shard) k smallest by (h, event_id), then k smallest of the
    union. The retained (event_type, event_id) sets must match Spark's
    exactly. The DuckDB oracle replays the same dataflow in SQL, so only an
    engine-independent replica like this one can catch a semantic slip in
    the shared spelling (the verify-skill blind-spot class)."""
    import hashlib

    import duckdb

    from datafusion_distributed_experiment_spark.operators.sketches import (
        QSKETCH_K,
        QSKETCH_SHARDS,
        quantile_sketch_sample,
    )
    from datafusion_distributed_experiment_spark.sources.events import read_events

    rows = duckdb.connect().execute(
        f"SELECT event_type, event_id FROM '{SF_DIR}/events.parquet'"
    ).fetchall()
    by_shard: dict[tuple[str, int], list[tuple[int, int]]] = {}
    for t, eid in rows:
        h = int(hashlib.md5(str(eid).encode()).hexdigest()[:12], 16)
        by_shard.setdefault((t, eid % QSKETCH_SHARDS), []).append((h, eid))
    by_type: dict[str, list[tuple[int, int]]] = {}
    for (t, _), hs in by_shard.items():
        by_type.setdefault(t, []).extend(sorted(hs)[:QSKETCH_K])
    want = {
        (t, eid) for t, hs in by_type.items() for _, eid in sorted(hs)[:QSKETCH_K]
    }
    ev = read_events(spark, SF_DIR).select("event_type", "event_id", "value_cents")
    got = {
        (r["event_type"], r["event_id"])
        for r in quantile_sketch_sample(ev).collect()
    }
    assert got == want


def test_quantile_sketch_is_partitioning_independent(spark):
    """1 vs 8 shuffle partitions must produce the identical result rows —
    the bottom-k order is total ((h, event_id) ties impossible), so the
    retained sample and every estimate are independent of physical
    partitioning, the property that makes the sketch safe under AQE
    re-planning and cluster-size changes."""
    from datafusion_distributed_experiment_spark.operators.sketches import (
        events_quantile_sketch,
    )

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        single = sorted(map(tuple, events_quantile_sketch(spark, SF_DIR).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        wide = sorted(map(tuple, events_quantile_sketch(spark, SF_DIR).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert single == wide


@given(
    ids=st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=300, unique=True),
    k=st.integers(min_value=1, max_value=40),
    shards=st.integers(min_value=1, max_value=9),
)
@settings(max_examples=200, deadline=None)
def test_bottom_k_merge_is_associative_property(ids, k, shards):
    """Property (pure Python, no Spark): min-k of a union == min-k of the
    per-shard min-k's, for ANY id multiset, k, and shard count — the
    algebraic fact the two-level sketch build rests on (the min-k analog
    of HLL's register-max merge)."""
    import hashlib

    hs = sorted(
        (int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16), i) for i in ids
    )
    direct = set(hs[:k])
    per_shard: dict[int, list] = {}
    for h, i in hs:
        per_shard.setdefault(i % shards, []).append((h, i))
    merged = set(sorted(x for v in per_shard.values() for x in sorted(v)[:k])[:k])
    assert merged == direct


# --------------------------------------------------------------------- #
# Round-12 hardening sweep: latent divergences the oracle cannot see on
# the NULL-free synthetic data (the round-11 sweep's doctrine)
# --------------------------------------------------------------------- #


def _events_with_nulls(tmp_path, cols) -> str:
    """sf0.001 events plus rows carrying NULLs in each of ``cols`` — the
    adversarial fixture the NULL-exclusion contracts are pinned on; only
    the columns the operator under test FILTERS are nulled, because a row
    nulled elsewhere is a legitimate extra event that changes totals.
    Built with pyarrow so the ts column type (and the unit-adaptive
    reader's footer probe) round-trips untouched."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/events.parquet")

    def _nulled(col: str) -> pa.Table:
        head = t.slice(0, 3)
        i = head.schema.get_field_index(col)
        return head.set_column(
            i, head.schema.field(i), pa.nulls(3, head.schema.field(i).type)
        )

    out = pa.concat_tables([t, *(_nulled(c) for c in cols)])
    d = tmp_path / "events_nulls"
    d.mkdir()
    pq.write_table(out, str(d / "events.parquet"))
    return str(d)


def test_hll_excludes_null_keys(spark, tmp_path):
    """COUNT(DISTINCT) semantics for the HLL sketch, pinned after a
    review-found ORACLE-BLIND defect (round 12): hash48(NULL) is a NULL
    register bucket that inflates n_buckets without contributing to
    sum_nz — corrupting n_zero_registers and the estimate IDENTICALLY in
    both engines, so only a constructed NULL-bearing corpus can see it.
    NULL-keyed rows must change nothing."""
    import duckdb

    from datafusion_distributed_experiment_spark.operators.sketches import (
        _hll_oracle,
        hll_distinct,
    )

    nulls_dir = _events_with_nulls(tmp_path, ["user_id"])
    got = [tuple(r) for r in hll_distinct(spark, nulls_dir).collect()]
    clean = [tuple(r) for r in hll_distinct(spark, SF_DIR).collect()]
    assert got == clean, "NULL-keyed rows must not perturb the sketch"
    # cross-engine on the SAME adversarial data: the fixed oracle must
    # agree with the fixed Spark side where the old pair agreed on being
    # wrong together
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{nulls_dir}/events.parquet'"
    )
    odf = con.execute(_hll_oracle()["hll_distinct"]).df()
    assert [tuple(r) for r in odf.itertuples(index=False)] == got


def test_quantile_sketch_excludes_null_rows(spark, tmp_path):
    """The rank sketch's NULL contract, pinned after a review-found
    ENGINE-ORDERING divergence (round 12): Spark ranks NULLs FIRST in an
    ascending window, DuckDB LAST, so a NULL event_id (NULL hash) or NULL
    value_cents row inside a >k-row group silently swaps the retained
    sample between engines. Both spellings now exclude such rows at the
    source; a NULL-bearing corpus must produce the clean corpus's
    output on BOTH engines."""
    import duckdb

    from datafusion_distributed_experiment_spark.operators.sketches import (
        _quantile_sketch_oracle,
        events_quantile_sketch,
    )

    # 'value' is the raw column; value_cents derives from it in
    # read_events, and NULL propagates through the cents quantization
    nulls_dir = _events_with_nulls(tmp_path, ["event_id", "value"])
    got = [tuple(r) for r in events_quantile_sketch(spark, nulls_dir).collect()]
    clean = [tuple(r) for r in events_quantile_sketch(spark, SF_DIR).collect()]
    assert got == clean, "NULL-keyed/valued rows must not perturb the sketch"
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{nulls_dir}/events.parquet'"
    )
    odf = con.execute(_quantile_sketch_oracle()["events_quantile_sketch"]).df()
    assert [tuple(r) for r in odf.itertuples(index=False)] == got


def test_quantile_sketch_total_order_under_duplicate_ids(spark):
    """Retention is a total order even under DUPLICATE event_ids (round-12
    review: (h, event_id) tied for two rows with different value_cents,
    making the bottom-k boundary row partition-order dependent): the
    value_cents tie-break pins it. Same retained multiset at 1 vs 8
    shuffle partitions on a constructed duplicate-heavy frame."""
    from pyspark.sql import functions as F

    from datafusion_distributed_experiment_spark.operators.sketches import (
        QSKETCH_K,
        quantile_sketch_sample,
    )

    # 4 * QSKETCH_K rows, every event_id duplicated with two values
    n = 2 * QSKETCH_K
    base = spark.range(n).select(
        F.lit("t").alias("event_type"),
        (F.col("id") % (n // 2)).alias("event_id"),
        (F.col("id") * 17 % 1000).cast("long").alias("value_cents"),
    )

    def run():
        return sorted(
            (r["event_id"], r["value_cents"])
            for r in quantile_sketch_sample(base).collect()
        )

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        one = run()
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        eight = run()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert one == eight and len(one) == QSKETCH_K


def test_cms_hash_headroom_guard():
    """Overflow-guard family contract for the affine bucket hash (round-12
    review: A_d*u wraps silently on Spark with ANSI off while DuckDB
    raises — a succeed-vs-crash divergence the heavy-flag guard did not
    cover): pure function, pass at any sane key space, trip before an
    int64 product can wrap."""
    from datafusion_distributed_experiment_spark.errors import PlanningError
    from datafusion_distributed_experiment_spark.operators.sketches import (
        CMS_A,
        CMS_B,
        check_cms_hash_headroom,
    )

    bound = (2**63 - 1 - max(CMS_B)) // max(CMS_A)
    check_cms_hash_headroom(0)
    check_cms_hash_headroom(bound)
    with pytest.raises(PlanningError, match="affine hash"):
        check_cms_hash_headroom(bound + 1)


def test_ppm_headroom_guard():
    """Overflow-guard family contract for the profile's exact-integer ppm
    forms (1_000_000 * x must fit int64): pure, trips at the bound."""
    from datafusion_distributed_experiment_spark.errors import PlanningError
    from datafusion_distributed_experiment_spark.operators.sketches import (
        check_ppm_headroom,
    )

    bound = (2**63 - 1) // 1_000_000
    check_ppm_headroom(0, 0)
    check_ppm_headroom(bound, bound)
    with pytest.raises(PlanningError, match="ppm share"):
        check_ppm_headroom(bound + 1, 0)
    with pytest.raises(PlanningError, match="ppm share"):
        check_ppm_headroom(0, bound + 1)


def test_ppm_zero_total_guard():
    """Round-13 review fix: with the LEFT-join zero-default path keeping
    all-empty-token sources, a corpus whose EVERY document tokenizes empty
    yields total_tokens=0 while the profile is non-empty — Spark's
    (1000000 * x) DIV 0 returns NULL (ANSI off) while DuckDB's // 0 raises,
    the succeed-vs-crash divergence class. The guard trips loudly instead;
    an EMPTY profile (n_sources=0) stays fine (no rows to diverge on)."""
    from datafusion_distributed_experiment_spark.errors import PlanningError
    from datafusion_distributed_experiment_spark.operators.sketches import (
        check_ppm_headroom,
    )

    check_ppm_headroom(0, 0, n_sources=0)  # empty profile: nothing to emit
    check_ppm_headroom(10, 3, n_sources=2)  # normal profile
    for tok, est in ((0, 0), (10, 0), (0, 3)):
        with pytest.raises(PlanningError, match="zero totals"):
            check_ppm_headroom(tok, est, n_sources=2)


def test_domain_profile_all_empty_corpus_raises(spark, tmp_path):
    """End-to-end trip of the zero-total guard: a documents table whose
    every row tokenizes empty reaches the share arithmetic with
    total_tokens=0 and must raise PlanningError, not emit NULL shares."""
    import pyspark.sql.functions as F

    from datafusion_distributed_experiment_spark.errors import PlanningError
    from datafusion_distributed_experiment_spark.operators.sketches import (
        domain_token_profile,
    )

    src = str(tmp_path / "docs")
    spark.range(4).select(
        F.col("id").alias("doc_id"),
        F.lit("srcA").alias("source"),
        F.lit("     ").alias("text"),  # whitespace only -> 0 tokens
    ).write.parquet(f"{src}/documents.parquet")
    with pytest.raises(PlanningError, match="zero totals"):
        domain_token_profile(spark, src)


def test_domain_profile_keeps_empty_sources(spark, tmp_path):
    """Dataset-accounting doctrine, pinned after a review-found
    ORACLE-BLIND drop (round 12): a source whose every document tokenizes
    to empty had no sketch/exact group and the inner joins removed it from
    the profile ENTIRELY — identically in both engines. LEFT joins with
    zero defaults keep it; cross-engine agreement pinned on the same
    adversarial corpus."""
    import duckdb

    from datafusion_distributed_experiment_spark.operators.sketches import (
        _domain_profile_oracle,
        domain_token_profile,
    )

    d = tmp_path / "docs_empty_source"
    d.mkdir()
    rows = [
        (1, "web", "alpha beta gamma"),
        (2, "web", "delta epsilon"),
        (3, "silent", ""),
        (4, "silent", "   "),
    ]
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    got = {r["source"]: tuple(r) for r in domain_token_profile(spark, str(d)).collect()}
    assert set(got) == {"web", "silent"}, "empty source must stay in the profile"
    silent = got["silent"]
    # (source, n_docs, src_tokens, share_ppm, est, exact, div_share, weight)
    assert silent[1] == 2 and silent[2] == 0 and silent[4] == 0 and silent[5] == 0
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    odf = con.execute(_domain_profile_oracle()["domain_token_profile"]).df()
    assert {tuple(r) for r in odf.itertuples(index=False)} == set(got.values())
