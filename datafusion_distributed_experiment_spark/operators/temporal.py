"""Temporal relational operators Spark lacks as built-ins: as-of join,
interval range join, and a KMV distinct-count sketch.

The reference engine's surface stops at classic relational operators
(reference src/ has no temporal joins); these are the standard extensions a
time-series / training-data pipeline needs on top, each expressed as a
composition of DataFrame primitives so Catalyst plans them like any other
query — no Python in any hot path.

Scale design:

- ``asof_join``: the naive plan is an inequality join (quadratic per key).
  This kernel instead unions both sides and takes one window pass per key
  (``last(..., ignorenulls)`` over ``ORDER BY ts, side``) — a single hash
  shuffle on the key, linear work, the same shape Flink/QuestDB use for
  as-of. 100 TB: partitioning is by join key, so parallelism = #keys;
  hot-key cost is inherent to as-of semantics (per-key ordering).
- ``range_join_intervals``: equi-join on (key, coarse time bucket) with the
  interval side exploded across the buckets it covers, then the exact
  BETWEEN as a post-filter. Each probe row lands in exactly ONE bucket, so
  no pair dedup is needed. Explode factor = interval_len / bucket_width —
  pick ``bucket_ms`` near the typical interval length to bound it.
- ``kmv_distinct``: k-minimum-values sketch over md5-derived 48-bit hashes.
  Min-k is a semilattice (top-k of a union == top-k of per-group top-ks),
  so the two-level salt tree below computes EXACTLY the single-node answer
  while keeping every ``collect_list`` bounded: level 1 holds one salt
  bucket's distinct hashes, level 2 holds at most ``n_salt * k`` values.
  All arithmetic is 48-bit integer (63 * 2^48 < 2^63) so Spark and the
  DuckDB oracle agree bit-for-bit — no float estimator drift.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# --------------------------------------------------------------------- #
# shared events source (unit-adaptive; see sources/events.py)
# --------------------------------------------------------------------- #

from ..sources.events import DUCK_EVENTS_MS as _DUCK_EVENTS_MS
from ..sources.events import read_events as _events_ms

MS_PER_DAY = 86_400_000
MS_PER_HOUR = 3_600_000


# --------------------------------------------------------------------- #
# as-of join
# --------------------------------------------------------------------- #

def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts: str,
    payloads: Sequence[str],
    strict: bool = False,
) -> DataFrame:
    """For every left row, attach the payload of the latest right row with
    ``right.ts <= left.ts`` (``<`` when ``strict``) and equal ``on`` keys —
    LEFT-join semantics (unmatched left rows keep null payloads).

    ``right`` must be unique per (on, ts); pre-aggregate if it isn't (ties
    would otherwise be resolved by arrival order). Implementation: union the
    sides with a sort tag, one window pass of ``last(matched_row_struct,
    ignorenulls)`` per key. The matched row travels as ONE struct — not as
    per-column ``last(payload, ignorenulls)`` — so every output payload
    comes from the SAME right row as ``ts_asof``, and a matched row whose
    payload is NULL stays NULL instead of leaking an older row's value
    (the DuckDB ``ASOF LEFT JOIN`` semantics). Right rows with a NULL
    ``ts`` are dropped before the union: an unknown timestamp can never be
    the latest-prior row (NULL fails the ASOF comparison on both engines),
    and under the nulls-first window order it would otherwise shadow the
    no-match case for every left row. Right rows sort before left at equal
    ts (tag 0 < 1) so equal-ts rows are visible under non-strict
    semantics; under ``strict`` the tags flip. Single shuffle on ``on`` —
    no inequality join, no fan-out.
    """
    from pyspark.sql.types import StructField, StructType

    on = list(on)
    payloads = list(payloads)
    r_types = {p: right.schema[p].dataType for p in payloads}
    ts_type = right.schema[ts].dataType
    extras = [c for c in left.columns if c not in on and c != ts]
    match_type = StructType(
        [StructField("__asof_ts", ts_type)]
        + [StructField(f"__p_{p}", r_types[p]) for p in payloads]
    )

    l2 = left.select(
        *on,
        F.col(ts),
        F.lit(1 if not strict else 0).alias("__side"),
        F.lit(None).cast(match_type).alias("__m"),
        *extras,
    )
    r2 = right.filter(F.col(ts).isNotNull()).select(
        *on,
        F.col(ts),
        F.lit(0 if not strict else 1).alias("__side"),
        F.struct(
            F.col(ts).alias("__asof_ts"),
            *[F.col(p).alias(f"__p_{p}") for p in payloads],
        ).alias("__m"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in extras],
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(ts, "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = l2.unionByName(r2)
    matched = tagged.select(
        *on,
        F.col(ts),
        F.col("__side"),
        F.last("__m", ignorenulls=True).over(w).alias("__m"),
        *extras,
    )
    left_tag = 1 if not strict else 0
    return (
        matched.filter(F.col("__side") == left_tag)
        .select(
            *on,
            F.col(ts),
            F.col("__m.__asof_ts").alias(f"{ts}_asof"),
            *[F.col(f"__m.__p_{p}").alias(p) for p in payloads],
            *extras,
        )
    )


def events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every click annotated with the user's most recent prior-or-equal view
    (its timestamp and value) — the canonical attribution as-of query."""
    ev = _events_ms(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts_ms", "event_id"
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts_ms")
        .agg(F.max("value_cents").alias("view_value_cents"))
    )
    out = asof_join(clicks, views, on=["user_id"], ts="ts_ms", payloads=["view_value_cents"])
    return out.select(
        "event_id",
        "user_id",
        "ts_ms",
        F.col("ts_ms_asof").alias("view_ts_ms"),
        "view_value_cents",
    ).orderBy("event_id")


_ASOF_ORACLE = f"""
    WITH ev AS ({_DUCK_EVENTS_MS}),
    clicks AS (
        SELECT event_id, user_id, ts_ms FROM ev WHERE event_type = 'click'
    ),
    views AS (
        SELECT user_id, ts_ms, MAX(value_cents) AS view_value_cents
        FROM ev WHERE event_type = 'view' GROUP BY user_id, ts_ms
    )
    SELECT c.event_id, c.user_id, c.ts_ms,
           v.ts_ms AS view_ts_ms, v.view_value_cents
    FROM clicks c ASOF LEFT JOIN views v
      ON c.user_id = v.user_id AND c.ts_ms >= v.ts_ms
    ORDER BY c.event_id
"""


# --------------------------------------------------------------------- #
# range join (probe points vs. keyed intervals)
# --------------------------------------------------------------------- #

def range_join_intervals(
    probe: DataFrame,
    intervals: DataFrame,
    on: Sequence[str],
    ts: str,
    start: str,
    end: str,
    bucket_ms: int,
) -> DataFrame:
    """Inner-join probe rows into the ``[start, end]`` intervals that contain
    them (equal ``on`` keys). Equi-join on (key, bucket) with the interval
    exploded over its covered buckets; the probe's single bucket membership
    makes each (probe, interval) pair appear exactly once — no dedup."""
    on = list(on)
    b_probe = probe.withColumn("__b", F.expr(f"{ts} DIV {bucket_ms}"))
    b_iv = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.expr(f"{start} DIV {bucket_ms}"), F.expr(f"{end} DIV {bucket_ms}")
            )
        ),
    )
    return (
        b_probe.join(b_iv, on + ["__b"])
        .filter(F.col(ts).between(F.col(start), F.col(end)))
        .drop("__b")
    )


RANGE_BUCKET_MS = MS_PER_HOUR


def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily error windows [first error, last error] with the count
    of clicks that fall inside — incident-correlation as a range join.
    Windows with zero clicks survive (left-count shape)."""
    ev = _events_ms(spark, sf_dir)
    iv = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id", F.expr(f"ts_ms DIV {MS_PER_DAY}").alias("day_no"))
        .agg(F.min("ts_ms").alias("start_ms"), F.max("ts_ms").alias("end_ms"))
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts_ms")
    hits = range_join_intervals(
        clicks, iv, on=["user_id"], ts="ts_ms",
        start="start_ms", end="end_ms", bucket_ms=RANGE_BUCKET_MS,
    )
    counts = hits.groupBy("user_id", "day_no").agg(
        F.count("*").cast("long").alias("n_clicks")
    )
    return (
        iv.join(counts, ["user_id", "day_no"], "left")
        .select(
            "user_id",
            "day_no",
            "start_ms",
            "end_ms",
            F.coalesce(F.col("n_clicks"), F.lit(0)).cast("long").alias("n_clicks"),
        )
        .orderBy("user_id", "day_no")
    )


_RANGE_ORACLE = f"""
    WITH ev AS ({_DUCK_EVENTS_MS}),
    iv AS (
        SELECT user_id, ts_ms // {MS_PER_DAY} AS day_no,
               MIN(ts_ms) AS start_ms, MAX(ts_ms) AS end_ms
        FROM ev WHERE event_type = 'error' GROUP BY 1, 2
    )
    SELECT iv.user_id, iv.day_no, iv.start_ms, iv.end_ms,
           CAST(COUNT(c.ts_ms) AS BIGINT) AS n_clicks
    FROM iv LEFT JOIN ev c
      ON c.user_id = iv.user_id AND c.event_type = 'click'
     AND c.ts_ms BETWEEN iv.start_ms AND iv.end_ms
    GROUP BY 1, 2, 3, 4
    ORDER BY 1, 2
"""


# --------------------------------------------------------------------- #
# KMV distinct sketch
# --------------------------------------------------------------------- #

KMV_K = 64
KMV_SALTS = 64
HASH_HEX_DIGITS = 12            # 48-bit hashes: exact in BIGINT and in the
HASH_SPACE = 1 << (4 * HASH_HEX_DIGITS)  # estimator's integer arithmetic


def hash48(col: Column) -> Column:
    """Deterministic uniform 48-bit hash shared bit-for-bit with the oracle
    (DuckDB spelling: ``('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 12))::BIGINT``)."""
    return F.conv(
        F.substring(F.md5(col.cast("string").cast("binary")), 1, HASH_HEX_DIGITS), 16, 10
    ).cast("long")


def kmv_distinct(
    df: DataFrame, group: str, key: Column, k: int = KMV_K, n_salt: int = KMV_SALTS
) -> DataFrame:
    """Per-``group`` distinct-count estimate of ``key`` from the k smallest
    distinct hash values. Exact when the group has < k distinct keys.

    Two-level k-min tree: distinct hashes -> per-(group, salt) k smallest ->
    global k smallest. Identical to the flat answer (min-k is associative),
    but no aggregation state ever exceeds max(bucket_distincts, n_salt * k)
    values — the flat window-rank plan would funnel every distinct hash of a
    group through one task.

    NULL keys are excluded EXPLICITLY (``COUNT(DISTINCT)`` semantics — a
    NULL key is unknown, not a distinct value): without the filter the two
    levels disagree between engines, because Spark's ``collect_list``
    silently skips NULLs while a SQL ``ROW_NUMBER ... ORDER BY h`` ranks
    the NULL row NULLS-LAST into the kept set of any group under k keys."""
    h = (
        df.select(F.col(group), key.alias("__h"))
        .filter(F.col("__h").isNotNull())
        .distinct()
    )
    l1 = (
        h.groupBy(group, F.pmod("__h", F.lit(n_salt)).alias("__salt"))
        .agg(F.slice(F.array_sort(F.collect_list("__h")), 1, k).alias("hs"))
    )
    l2 = (
        l1.select(group, F.explode("hs").alias("__h"))
        .groupBy(group)
        .agg(F.slice(F.array_sort(F.collect_list("__h")), 1, k).alias("hs"))
    )
    n_kept = F.size("hs").cast("long")
    kth = F.element_at("hs", F.size("hs")).cast("long")
    return l2.select(
        F.col(group),
        n_kept.alias("n_kept"),
        kth.alias("kth_hash"),
        F.when(n_kept < k, n_kept)
        .otherwise(F.expr(f"CAST({(k - 1) * HASH_SPACE} DIV element_at(hs, size(hs)) AS BIGINT)"))
        .cast("long")
        .alias("est_distinct"),
    )


def events_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-user estimate per event type via the KMV sketch."""
    ev = _events_ms(spark, sf_dir)
    return kmv_distinct(ev, "event_type", hash48(F.col("user_id"))).orderBy("event_type")


_KMV_ORACLE = f"""
    WITH h AS (
        SELECT DISTINCT event_type,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, {HASH_HEX_DIGITS})) AS BIGINT) AS h
        FROM events
        WHERE user_id IS NOT NULL
    ),
    r AS (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM h
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(MAX(h) AS BIGINT) AS kth_hash,
           CAST(CASE WHEN COUNT(*) < {KMV_K} THEN COUNT(*)
                     ELSE {(KMV_K - 1) * HASH_SPACE} // MAX(h) END AS BIGINT) AS est_distinct
    FROM r WHERE rn <= {KMV_K}
    GROUP BY event_type
    ORDER BY event_type
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "events_asof": events_asof,
        "events_range_join": events_range_join,
        "events_kmv_distinct": events_kmv_distinct,
    }


def oracles() -> dict[str, str]:
    return {
        "events_asof": _ASOF_ORACLE,
        "events_range_join": _RANGE_ORACLE,
        "events_kmv_distinct": _KMV_ORACLE,
    }
