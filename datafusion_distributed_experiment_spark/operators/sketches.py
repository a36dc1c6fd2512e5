"""Count-min sketch: mergeable bounded-state frequency estimation.

The third sketch in the engine's sketch tier (KMV distinct counting lives in
``operators/temporal.py``, histogram percentiles in ``operators/
analytics.py``): the count-min sketch of Cormode & Muthukrishnan 2005
("An Improved Data Stream Summary: The Count-Min Sketch and its
Applications", public paper). D independent hash rows x W buckets of
counters; point estimate = min over rows; error is ONE-SIDED (estimate >=
true count, overshoot <= e*N/W with probability 1-e^-D) and the structure
is trivially mergeable — partial sketches from every partition combine by
cell-wise addition, which is exactly a Spark map-side-combinable groupBy.

``cms_heavy_hitters`` builds the sketch over the events stream keyed by
user and scores every user against it, emitting the estimate NEXT TO the
exact count so the one-sided bound is verifiable row by row (and is, in
pytest and in the DuckDB oracle). At 100 TB the sketch build is the point:
D*W bounded state per partition, one KB-scale aggregate — the exact
per-user groupBy exists here as the candidate/verification side, the same
pattern as ``events_kmv_distinct``'s exact twin.

All hashing is integer affine-mod ((A_d*u + B_d) mod P) mod W — identical
in both engines, no floats anywhere.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CMS_D = 4
CMS_W = 512
CMS_P = 2_147_483_647
CMS_A = (2, 3, 5, 7)
CMS_B = (1, 2, 3, 4)
# heavy = estimate > 1.2x the mean stream share (cross-multiplied: 5*est*n
# > 6*N), scale-free so the flag stays populated from sf0.001 to 100 TB.
HH_NUM, HH_DEN = 6, 5


def _events_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.events import read_events

    return read_events(spark, sf_dir).select("user_id")


def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user count-min estimate vs exact count over the events stream:
    ``(user_id, est_cnt, true_cnt, is_heavy)``.

    Scale shape: the sketch build is ONE aggregation whose key space is
    D x W cells regardless of stream size — partial sketches combine
    map-side, and the finished sketch (KB) BROADCASTS onto the candidate
    side. Estimating = D broadcast-join probes + a min-groupBy per
    candidate. The exact per-user count rides the same single shuffle the
    candidates need anyway; at a scale where the exact side is unaffordable
    the sketch alone answers point queries — that is its purpose."""
    ev = _events_users(spark, sf_dir)
    cells = (
        ev.select(
            "user_id", F.explode(F.array(*[F.lit(d) for d in range(CMS_D)])).alias("d")
        )
        .select(
            "d",
            (
                (
                    F.element_at(F.array(*[F.lit(a) for a in CMS_A]), F.col("d") + 1)
                    * F.col("user_id")
                    + F.element_at(F.array(*[F.lit(b) for b in CMS_B]), F.col("d") + 1)
                )
                % CMS_P
                % CMS_W
            ).alias("bucket"),
        )
        .groupBy("d", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    truth = ev.groupBy("user_id").agg(F.count("*").cast("long").alias("true_cnt"))
    total = ev.agg(
        F.count("*").cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
    )
    probes = truth.select(
        "user_id",
        "true_cnt",
        F.explode(F.array(*[F.lit(d) for d in range(CMS_D)])).alias("d"),
    ).select(
        "user_id",
        "true_cnt",
        "d",
        (
            (
                F.element_at(F.array(*[F.lit(a) for a in CMS_A]), F.col("d") + 1)
                * F.col("user_id")
                + F.element_at(F.array(*[F.lit(b) for b in CMS_B]), F.col("d") + 1)
            )
            % CMS_P
            % CMS_W
        ).alias("bucket"),
    )
    est = (
        probes.join(F.broadcast(cells), ["d", "bucket"])
        .groupBy("user_id", "true_cnt")
        .agg(F.min("cnt").alias("est_cnt"))
    )
    return (
        est.crossJoin(F.broadcast(total))
        .select(
            "user_id",
            "est_cnt",
            "true_cnt",
            (
                F.col("est_cnt") * F.col("n_users") * HH_DEN
                > F.col("n_events") * HH_NUM
            ).alias("is_heavy"),
        )
        .orderBy("user_id")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {"cms_heavy_hitters": cms_heavy_hitters}


def staged_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Empty since the round-7 promotion: cms_heavy_hitters moved into
    :func:`queries` and the driver gate window."""
    return {}


def staged_oracles() -> dict[str, str]:
    """Empty since the round-7 promotion (see :func:`staged_queries`)."""
    return {}


def _duck_bucket(d: int) -> str:
    return f"(({CMS_A[d]} * user_id + {CMS_B[d]}) % {CMS_P}) % {CMS_W}"


def oracles() -> dict[str, str]:
    cell_rows = " UNION ALL ".join(
        f"SELECT {d} AS d, {_duck_bucket(d)} AS bucket FROM events"
        for d in range(CMS_D)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT user_id, {d} AS d, {_duck_bucket(d)} AS bucket FROM truth_base"
        for d in range(CMS_D)
    )
    return {
        "cms_heavy_hitters": f"""
            WITH cells AS (
                SELECT d, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
                FROM ({cell_rows}) GROUP BY d, bucket
            ), truth_base AS (
                SELECT user_id, CAST(COUNT(*) AS BIGINT) AS true_cnt
                FROM events GROUP BY user_id
            ), total AS (
                SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
                       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
                FROM events
            ), probes AS (
                {probe_rows}
            ), est AS (
                SELECT p.user_id, CAST(MIN(c.cnt) AS BIGINT) AS est_cnt
                FROM probes p JOIN cells c ON c.d = p.d AND c.bucket = p.bucket
                GROUP BY p.user_id
            )
            SELECT t.user_id, e.est_cnt, t.true_cnt,
                   e.est_cnt * total.n_users * {HH_DEN} > total.n_events * {HH_NUM} AS is_heavy
            FROM truth_base t
            JOIN est e ON e.user_id = t.user_id
            CROSS JOIN total
            ORDER BY t.user_id
        """,
    }
