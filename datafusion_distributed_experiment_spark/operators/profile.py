"""Table profiling — per-column data-quality statistics in one pass.

The data-ops audit primitive a training-data pipeline runs before and after
every ingest: null counts and exact distinct cardinalities per column, as
rows (one per column) so downstream checks can join/threshold them.

Scale shape: a single aggregate pass. Spark plans the N ``count(distinct)``
aggregates through one Expand (N-fold row multiplication inside the
partial aggregate, not a per-column rescan of the table). Past
``PROFILE_BATCH_COLUMNS`` the Expand factor itself becomes the cost, so
wider profiles automatically run one pass per column batch (bounded Expand
per pass) and union the tiny results; sketched cardinalities
(``events_kmv_distinct`` is the exact-sketch building block) remain the
escape hatch past that. The exact form is what the oracle verifies
bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The driver's synthetic customer table (TESTDATA.md) carries this 5-column
# subset of the TPC-H schema; profile exactly what the data has.
PROFILE_TABLE = "customer"
PROFILE_COLUMNS = [
    "c_custkey",
    "c_name",
    "c_nationkey",
    "c_acctbal",
    "c_mktsegment",
]


# Past this many columns, the multi-distinct Expand (one row copy per
# distinct agg inside the partial aggregate) costs more than re-scanning:
# profile in batches of this width instead — B scans of the table, each
# with a bounded Expand factor, instead of one scan carrying a
# width-of-table row multiplication.
PROFILE_BATCH_COLUMNS = 16


def profile_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct) per column.

    One aggregate job up to :data:`PROFILE_BATCH_COLUMNS` columns; wider
    profiles run one job per batch and union the (column-count-sized)
    results — the Expand factor stays bounded at any table width."""
    if len(columns) > PROFILE_BATCH_COLUMNS:
        out = profile_columns(df, columns[:PROFILE_BATCH_COLUMNS])
        for i in range(PROFILE_BATCH_COLUMNS, len(columns), PROFILE_BATCH_COLUMNS):
            out = out.unionAll(
                profile_columns(df, columns[i : i + PROFILE_BATCH_COLUMNS])
            )
        return out.orderBy("column")
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for c in columns:
        aggs.append(F.count(c).cast("long").alias(f"__nn_{c}"))
        aggs.append(F.countDistinct(c).cast("long").alias(f"__nd_{c}"))
    row = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__n").alias("n_rows"),
            (F.col("__n") - F.col(f"__nn_{c}")).alias("n_nulls"),
            F.col(f"__nd_{c}").alias("n_distinct"),
        )
        for c in columns
    ]
    return (
        row.select(F.explode(F.array(*per_col)).alias("p"))
        .select("p.column", "p.n_rows", "p.n_nulls", "p.n_distinct")
        .orderBy("column")
    )


def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{PROFILE_TABLE}.parquet")
    return profile_columns(df, PROFILE_COLUMNS)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {"table_profile": table_profile}


def oracles() -> dict[str, str]:
    per_col = "\n            UNION ALL\n".join(
        f"""            SELECT '{c}' AS "column",
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
                   CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct
            FROM {PROFILE_TABLE}"""
        for c in PROFILE_COLUMNS
    )
    return {
        "table_profile": f"""
            SELECT * FROM (
{per_col}
            ) ORDER BY "column"
        """,
    }
