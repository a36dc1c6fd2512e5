"""CDC merge — apply an insert/update/delete change batch to a snapshot.

The incremental-table-maintenance primitive (MERGE INTO semantics) built
from plain DataFrame ops, for deployments without a transactional table
format. Extension beyond the reference surface (the reference is
batch-query-only); the daily-batch scale shape mirrors
``dedup.dedup_incremental``:

- the SNAPSHOT (the 100 TB side) is scanned exactly once and NEVER
  shuffles for the merge: update/delete ops are a broadcast hash lookup,
  deletes a map-side filter, updates a map-side coalesce;
- INSERT rows are unioned in — no join needed, CDC feeds mark ops
  explicitly;
- one output write (or the caller's downstream aggregation) is the only
  exchange.

Assumes at most one change row per key in the batch (the usual compacted
CDC contract), with ONE documented exception: a ``{D, I}`` pair per key
is accepted and ALWAYS interpreted as delete-then-reinsert (the key ends
up present with the I image) — the standard key-replacement sequence an
uncompacted feed emits (round-14 review). NOTE the interpretation is a
deliberate choice: the batch carries no sequence column, so a feed that
meant insert-then-RETRACT (key ends up absent) is indistinguishable and
will be resurrected — such feeds MUST compact upstream (or carry the
retraction as a lone D in the next batch) before calling this merge.
Any other multi-op combination raises loudly; compact with
``events_latest``'s keep-latest kernel when the feed has richer
intra-batch churn.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

OP_COL = "__op"


def cdc_merge(snapshot: DataFrame, changes: DataFrame, key: str) -> DataFrame:
    """Apply ``changes`` (carrying ``__op`` in {'I','U','D'}) to ``snapshot``.

    Non-key columns of ``changes`` must match the snapshot's; 'U' rows
    replace every non-key column — INCLUDING to NULL ('U' is a whole-row
    image, so a COALESCE spelling would silently keep the old value
    whenever an update legitimately nulls a column; round-12 review) —
    'D' rows remove the key, 'I' rows are appended verbatim. Rows whose
    ``__op`` is NULL or outside {'I','U','D'} RAISE instead of silently
    vanishing (a lowercase 'u' from upstream schema drift must not make
    the merge return a plausible-looking snapshot missing those changes).
    The check rides the merge's OWN evaluation as a ``raise_error`` CASE
    wrapped around every ``__op`` read — not an eager ``limit(1)``
    pre-pass, which evaluated the change lineage twice (a nondeterministic
    change source could pass the pre-check yet feed different rows to the
    actual merge) and taxed every merge with an extra driver job
    (round-12 review). The error therefore surfaces at ACTION time on the
    executor→driver propagation path (``errors.map_exception`` types it
    ``ExecutionError``, message intact). The snapshot side stays
    map-only.

    UPGRADE PIN (round-14 review): both guards depend on Catalyst
    evaluating the ``raise_error`` branches of CASE expressions that
    downstream filters consume; a future optimizer change that simplifies
    conditionals under predicates could silently disarm them.
    ``test_cdc_unknown_op_raises`` / ``test_cdc_duplicate_change_key_raises``
    are the designated regression pins across Spark upgrades — if either
    fails after a version bump, re-spell the guard as an ``assert_true``
    over a separately-projected validation column before weakening the
    tests."""
    checked_op = F.when(
        F.col(OP_COL).isin("I", "U", "D"), F.col(OP_COL)
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"cdc_merge: change batch carries an unknown {OP_COL} value '"
                ),
                F.coalesce(F.col(OP_COL), F.lit("NULL")),
                F.lit("' (expected 'I'/'U'/'D'); refusing to silently drop change rows"),
            )
        )
    )
    # Compacted-batch contract made LOUD (round-13 review): a DUPLICATE
    # key in the batch silently DOUBLE-APPLIES — two 'U' rows for one key
    # duplicate the snapshot row through the broadcast join, two 'I' rows
    # insert a duplicate primary key — corruption identical in any oracle
    # derived from the same batch. The count window rides the batch's own
    # evaluation (ONE delta-sized exchange on the broadcast side; the
    # snapshot side stays map-only) and raises before a corrupt merge can
    # be observed.
    #
    # ONE multi-op shape is accepted (round-14 review — the round-13
    # guard over-tightened the public contract): exactly a {D, I} pair
    # per key, the standard delete-then-reinsert CDC sequence an
    # uncompacted feed emits for a key replacement. It composes safely in
    # this dataflow regardless of row order — the D removes the snapshot
    # row via the broadcast lookup, the I appends the new image — so
    # rejecting it broke legitimate callers loudly for no integrity gain.
    # Every other multi-op combination (U+U, I+I, U+D, D+D, ...) still
    # raises; compact upstream with events_latest's keep-latest kernel
    # when the feed has richer intra-batch churn.
    from pyspark.sql import Window

    w = Window.partitionBy(key)
    ops_for_key = F.sort_array(F.collect_list(OP_COL).over(w))
    checked_op = F.when(
        (F.count("*").over(w) == 1)
        | (ops_for_key == F.array(F.lit("D"), F.lit("I"))),
        checked_op,
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("cdc_merge: change batch carries DUPLICATE rows for key "),
                F.col(key).cast("string"),
                F.lit(
                    " (the compacted-CDC contract is one change per key, or "
                    "exactly a delete-then-reinsert D+I pair); refusing to "
                    "double-apply — compact the feed first"
                ),
            )
        )
    )
    changes = changes.withColumn(OP_COL, checked_op)
    value_cols = [c for c in snapshot.columns if c != key]
    ud = changes.filter(F.col(OP_COL).isin("U", "D")).select(
        F.col(key),
        F.col(OP_COL).alias("__chg_op"),
        *[F.col(c).alias(f"__chg_{c}") for c in value_cols],
    )
    joined = snapshot.join(F.broadcast(ud), on=key, how="left")
    survivors = joined.filter(
        F.col("__chg_op").isNull() | (F.col("__chg_op") != "D")
    ).select(
        F.col(key),
        *[
            F.when(F.col("__chg_op") == "U", F.col(f"__chg_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in value_cols
        ],
    )
    inserts = changes.filter(F.col(OP_COL) == "I").select(key, *value_cols)
    return survivors.unionByName(inserts)


# Driver-verified query: a deterministic change batch derived from the
# customer table itself (so the DuckDB oracle reproduces it exactly):
#   key % 10 == 0        -> DELETE
#   key % 10 in (1, 2)   -> UPDATE (+100.00 to the balance)
#   key % 10 == 3        -> INSERT of a new key (+ max key) in 'NEWSEG'
# Insert keys offset by MAX(c_custkey), not a fixed constant: a fixed
# 1_000_000 collided with genuine custkeys once the table passed ~1M rows
# (TPC-H sf >= ~7), silently emitting duplicate primary keys in BOTH
# spellings (round-12 review).
UPDATE_CENTS = 10_000
INSERT_CENTS = 5_000


def _customer_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey",
        "c_mktsegment",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("acctbal_cents"),
    )


def cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _customer_base(spark, sf_dir)
    k = F.col("c_custkey")
    # scalar model state (one KB-scale collect, the centroid pattern);
    # the oracle derives the identical value via a scalar subquery
    max_key = base.agg(F.max("c_custkey")).collect()[0][0] or 0
    upd = base.filter((k % 10).isin(1, 2)).select(
        "c_custkey",
        "c_mktsegment",
        (F.col("acctbal_cents") + UPDATE_CENTS).alias("acctbal_cents"),
        F.lit("U").alias(OP_COL),
    )
    dele = base.filter(k % 10 == 0).select(
        "c_custkey", "c_mktsegment", "acctbal_cents", F.lit("D").alias(OP_COL)
    )
    ins = base.filter(k % 10 == 3).select(
        (k + F.lit(max_key)).alias("c_custkey"),
        F.lit("NEWSEG").alias("c_mktsegment"),
        F.lit(INSERT_CENTS).cast("long").alias("acctbal_cents"),
        F.lit("I").alias(OP_COL),
    )
    merged = cdc_merge(base, upd.unionAll(dele).unionAll(ins), key="c_custkey")
    return merged.orderBy("c_custkey")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {"cdc_apply_changes": cdc_apply_changes}


def oracles() -> dict[str, str]:
    return {
        "cdc_apply_changes": f"""
            WITH base AS (
                SELECT c_custkey, c_mktsegment,
                       CAST(ROUND(c_acctbal * 100) AS BIGINT) AS acctbal_cents
                FROM customer
            ), upd AS (
                SELECT c_custkey, c_mktsegment,
                       acctbal_cents + {UPDATE_CENTS} AS acctbal_cents
                FROM base WHERE c_custkey % 10 IN (1, 2)
            ), ins AS (
                SELECT c_custkey + (SELECT MAX(c_custkey) FROM base) AS c_custkey,
                       'NEWSEG' AS c_mktsegment,
                       CAST({INSERT_CENTS} AS BIGINT) AS acctbal_cents
                FROM base WHERE c_custkey % 10 = 3
            ), merged AS (
                -- presence test, not COALESCE: an update row legitimately
                -- setting a column to NULL must replace, not keep
                SELECT b.c_custkey,
                       CASE WHEN u.c_custkey IS NOT NULL
                            THEN u.c_mktsegment ELSE b.c_mktsegment END AS c_mktsegment,
                       CASE WHEN u.c_custkey IS NOT NULL
                            THEN u.acctbal_cents ELSE b.acctbal_cents END AS acctbal_cents
                FROM base b LEFT JOIN upd u USING (c_custkey)
                WHERE b.c_custkey % 10 <> 0
                UNION ALL
                SELECT c_custkey, c_mktsegment, acctbal_cents FROM ins
            )
            SELECT c_custkey, c_mktsegment, acctbal_cents
            FROM merged ORDER BY c_custkey
        """,
    }
