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

from pyspark.sql import Column, DataFrame
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
