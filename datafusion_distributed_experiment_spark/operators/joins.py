"""Skew-resilient join utilities.

AQE's runtime skew-join splitting (``spark.sql.adaptive.skewJoin.enabled``,
on by default in :mod:`..session`) handles most skew transparently. Salting
is the *static* counterpart for the cases AQE cannot fix: a single join key
so hot that one task would still receive it whole (AQE splits by partition,
and a partition holding one giant key cannot be split further for a
sort-merge join's right side, nor for any aggregation-like downstream
keyed on the raw key).

``salted_join`` spreads each left-side key over ``salt`` sub-keys
(deterministic hash of the whole row, not ``rand()`` — retries and
speculative task re-execution must land rows on the same salt) and
replicates the right side ``salt`` times, so the hottest key's work fans out
over ``salt`` tasks. Cost model: right side shuffles ``salt``x its size —
use only when the right side is far smaller than the skewed left, but too
big to broadcast.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_SALT = 16
_SALT_COL = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Column,
    salt: int = DEFAULT_SALT,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's hot keys salted across ``salt``
    sub-partitions and the right side replicated to match.

    ``on`` is the ordinary join condition (e.g. ``l.k == r.k``); the salt
    conjunct is added internally and dropped from the result. Result is
    row-identical to ``left.join(right, on, how)`` — pinned by the
    differential test in tests/test_joins.py."""
    if salt < 1:
        raise ValueError(f"salt must be >= 1, got {salt}")
    l_salted = left.withColumn(
        _SALT_COL, F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(salt))
    )
    r_salted = right.withColumn(
        _SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    cond = on & (l_salted[_SALT_COL] == r_salted[_SALT_COL])
    return l_salted.join(r_salted, cond, how).drop(_SALT_COL)


SALT_EVENTS = 8


def salted_events_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing salted-join query: the event stream joined to the
    customer dimension through :func:`salted_join` (the hot-user-key
    defense; dimension too big to broadcast is the scenario — here it is
    forced non-broadcast by the salt replication itself), aggregated per
    market segment. Salting must be row-identical to the plain join, so the
    DuckDB oracle IS the plain join — the driver's hash compare is the
    differential test at oracle strength."""
    from ..sources.events import read_events

    ev = read_events(spark, sf_dir)
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").alias("cust_id"), "c_mktsegment"
    )
    joined = salted_join(ev, cust, ev["user_id"] == cust["cust_id"], salt=SALT_EVENTS)
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("value_cents").cast("long").alias("total_cents"),
        )
        .orderBy("c_mktsegment")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {"salted_events_enrich": salted_events_enrich}


def oracles() -> dict[str, str]:
    return {
        "salted_events_enrich": """
            SELECT c_mktsegment,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
            FROM events JOIN customer ON user_id = c_custkey
            GROUP BY c_mktsegment
            ORDER BY c_mktsegment
        """,
    }
