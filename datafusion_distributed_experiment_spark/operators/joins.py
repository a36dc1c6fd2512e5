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
    differential test in tests/test_joins.py — for the SUPPORTED join
    types: inner, left (outer), left_semi, left_anti, cross. RIGHT and
    FULL outer joins are REJECTED loudly (round-12 review): every right
    row is replicated ``salt`` times, so its salt-1 unmatched replicas
    would each survive a right/full outer join as spurious NULL-left
    rows — salting the other side is the correct spelling there."""
    if salt < 1:
        raise ValueError(f"salt must be >= 1, got {salt}")
    normalized = how.lower().replace("_", "")
    if normalized in {"right", "rightouter", "full", "fullouter", "outer"}:
        from ..errors import PlanningError

        raise PlanningError(
            f"salted_join does not support how={how!r}: the replicated "
            "right side's unmatched salt copies would surface as spurious "
            "NULL-left rows; swap the sides (salt the other input) for "
            "right/full outer semantics"
        )
    l_salted = left.withColumn(
        _SALT_COL, F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(salt))
    )
    r_salted = right.withColumn(
        _SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    cond = on & (l_salted[_SALT_COL] == r_salted[_SALT_COL])
    return l_salted.join(r_salted, cond, how).drop(_SALT_COL)


SALT_EVENTS = 8

# Bloom semi-join reduction: bits per build-side key (16x => ~2 bits/key
# false-positive mass with k=2 probes, fpp ~0.2%) and a hard cap keeping the
# bitmap literal driver/plan-friendly (2^20 bits = 128 KiB of longs).
BLOOM_BITS_PER_KEY = 16
BLOOM_MAX_BITS = 1 << 20
_WORD = 64
_BLOOM_SEED2 = 0x9E3779B9  # second xxhash64 probe: same key, distinct seed column


def bloom_filter_words(keys: DataFrame, col: str, n_bits: int) -> list[int]:
    """Distributed bloom-filter build over ``keys[col]``: k=2 xxhash64 probes
    per key, bits OR-folded into ``n_bits/64`` words by a single partial/final
    ``bit_or`` aggregate. Only the FINISHED bitmap (n_bits/8 bytes, KB-scale
    model state like the IVF centroids, ``similarity.py``) reaches the
    driver — never the keys."""
    if n_bits <= 0 or n_bits % _WORD != 0:
        # a truncated word count would let pmod positions index past the
        # bitmap (build-side IndexError), and a probe-side modulus derived
        # from len(words)*64 would disagree with the build modulus —
        # silent false negatives, i.e. dropped join rows (round-12 review)
        raise ValueError(
            f"n_bits must be a positive multiple of {_WORD}, got {n_bits}"
        )
    n_words = n_bits // _WORD
    probes = [F.xxhash64(F.col(col)), F.xxhash64(F.col(col), F.lit(_BLOOM_SEED2))]
    word_rows = (
        keys.select(F.explode(F.array(*[F.pmod(p, F.lit(n_bits)) for p in probes])).alias("pos"))
        # shiftleft via expr: the Python API's numBits slot only takes a
        # literal int, not a per-row column.
        .groupBy(F.expr(f"CAST(pos DIV {_WORD} AS INT)").alias("w"))
        .agg(F.bit_or(F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {_WORD} AS INT))")).alias("bits"))
        .collect()
    )
    words = [0] * n_words
    for r in word_rows:
        words[r["w"]] = r["bits"]
    return words


def bloom_might_contain(words: list[int], col: str) -> Column:
    """Membership predicate against an inlined bloom bitmap: same k=2 probes,
    ``element_at`` into the array literal + bit test. Pure projection — the
    probe side is filtered map-side with ZERO shuffle, the point of the
    reduction."""
    n_bits = len(words) * _WORD
    # The bitmap ships as ONE parsed SQL array literal. Neither of the
    # obvious spellings survives profiling: array(lit, lit, ...) builds 8192
    # py4j Column objects (seconds of analysis), and F.lit(python_list)
    # marshals element-by-element over py4j (measured 3.7s for 8192 longs).
    # A single expression string is one py4j round trip + one fast parse.
    arr = F.expr("array(" + ",".join(f"{int(w)}L" for w in words) + ")")
    cond = None
    for hash_sql in (f"xxhash64({col})", f"xxhash64({col}, {_BLOOM_SEED2})"):
        pos = f"pmod({hash_sql}, {n_bits})"
        word = F.element_at(arr, F.expr(f"CAST({pos} DIV {_WORD} AS INT)") + 1)
        mask = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({pos} % {_WORD} AS INT))")
        hit = word.bitwiseAND(mask) != 0
        cond = hit if cond is None else cond & hit
    return cond


def bloom_semi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered fact/filtered-dimension join: lineitems of URGENT
    orders, aggregated per return flag.

    The scale technique: when the dimension's qualifying keys are too many
    to broadcast-join cheaply but the fact side is huge, ship a BLOOM of the
    keys (n_bits/8 bytes regardless of key count) and filter the fact table
    map-side BEFORE its join shuffle — only the surviving ~selectivity
    fraction shuffles. False positives are removed by the exact join that
    follows, so the result is row-identical to the plain join (the DuckDB
    oracle IS the plain join). Spark's AQE can inject runtime bloom filters
    for this shape on its own (``spark.sql.optimizer.runtime.bloomFilter``);
    the explicit form pins the behavior plan-visibly and works on any
    boundary AQE won't cross. Reference analog: the reference ships
    partition-pruning metadata between stages over Arrow Flight
    (``src/flight_service/do_get.rs``); a bloom bitmap is the same
    stage-to-stage reduction artifact."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    n_keys = max(urgent.count(), 1)
    n_bits = min(BLOOM_MAX_BITS, max(1 << 12, 1 << (n_keys * BLOOM_BITS_PER_KEY - 1).bit_length()))
    words = bloom_filter_words(urgent, "o_orderkey", n_bits)

    line = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_returnflag", "l_quantity"
    )
    survivors = line.filter(bloom_might_contain(words, "l_orderkey"))
    exact = survivors.join(urgent, survivors["l_orderkey"] == urgent["o_orderkey"])
    return (
        exact.groupBy("l_returnflag")
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias("qty_cents"),
        )
        .orderBy("l_returnflag")
    )


def salted_events_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing salted-join query: the event stream joined to the
    customer dimension through :func:`salted_join` (the hot-user-key
    defense; dimension too big to broadcast is the scenario — here it is
    forced non-broadcast by the salt replication itself), aggregated per
    market segment. Salting must be row-identical to the plain join, so the
    DuckDB oracle IS the plain join — the driver's hash compare is the
    differential test at oracle strength.

    DOMAIN PRECONDITION (the streaming ``_total_value`` contract): cents
    sums must stay inside int64 — past it Spark (ANSI off) wraps silently
    while DuckDB's HUGEINT sum raises on the BIGINT cast, a
    succeed-vs-crash divergence. Money-typed inputs sit orders of
    magnitude inside the bound."""
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
    return {
        "salted_events_enrich": salted_events_enrich,
        "bloom_semi_agg": bloom_semi_agg,
    }


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
        # The bloom prefilter must be output-invisible: the oracle is the
        # PLAIN join (false positives die in the exact join).
        "bloom_semi_agg": """
            SELECT l_returnflag,
                   CAST(COUNT(*) AS BIGINT) AS n_items,
                   CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderpriority = '1-URGENT'
            GROUP BY l_returnflag
            ORDER BY l_returnflag
        """,
    }
