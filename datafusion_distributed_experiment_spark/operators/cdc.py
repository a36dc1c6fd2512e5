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
CDC contract; compact upstream with ``events_latest``'s keep-latest kernel
when the feed has intra-batch churn).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

OP_COL = "__op"


def cdc_merge(snapshot: DataFrame, changes: DataFrame, key: str) -> DataFrame:
    """Apply ``changes`` (carrying ``__op`` in {'I','U','D'}) to ``snapshot``.

    Non-key columns of ``changes`` must match the snapshot's; 'U' rows
    replace every non-key column, 'D' rows remove the key, 'I' rows are
    appended verbatim. The snapshot side stays map-only: the change set is
    broadcast (daily batches are small relative to a 100 TB snapshot — the
    same asymmetry dedup_incremental exploits)."""
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
        *[F.coalesce(F.col(f"__chg_{c}"), F.col(c)).alias(c) for c in value_cols],
    )
    inserts = changes.filter(F.col(OP_COL) == "I").select(key, *value_cols)
    return survivors.unionByName(inserts)


# Driver-verified query: a deterministic change batch derived from the
# customer table itself (so the DuckDB oracle reproduces it exactly):
#   key % 10 == 0        -> DELETE
#   key % 10 in (1, 2)   -> UPDATE (+100.00 to the balance)
#   key % 10 == 3        -> INSERT of a new key (+1_000_000) in 'NEWSEG'
INSERT_KEY_OFFSET = 1_000_000
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
    upd = base.filter(k % 10 == 1).unionAll(base.filter(k % 10 == 2)).select(
        "c_custkey",
        "c_mktsegment",
        (F.col("acctbal_cents") + UPDATE_CENTS).alias("acctbal_cents"),
        F.lit("U").alias(OP_COL),
    )
    dele = base.filter(k % 10 == 0).select(
        "c_custkey", "c_mktsegment", "acctbal_cents", F.lit("D").alias(OP_COL)
    )
    ins = base.filter(k % 10 == 3).select(
        (k + INSERT_KEY_OFFSET).alias("c_custkey"),
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
                SELECT c_custkey + {INSERT_KEY_OFFSET} AS c_custkey,
                       'NEWSEG' AS c_mktsegment,
                       CAST({INSERT_CENTS} AS BIGINT) AS acctbal_cents
                FROM base WHERE c_custkey % 10 = 3
            ), merged AS (
                SELECT b.c_custkey,
                       COALESCE(u.c_mktsegment, b.c_mktsegment) AS c_mktsegment,
                       COALESCE(u.acctbal_cents, b.acctbal_cents) AS acctbal_cents
                FROM base b LEFT JOIN upd u USING (c_custkey)
                WHERE b.c_custkey % 10 <> 0
                UNION ALL
                SELECT c_custkey, c_mktsegment, acctbal_cents FROM ins
            )
            SELECT c_custkey, c_mktsegment, acctbal_cents
            FROM merged ORDER BY c_custkey
        """,
    }
