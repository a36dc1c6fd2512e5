-- Pricing summary report (reference testdata/tpch/queries/q1.sql, adapted to
-- the driver's simplified schema). Aggregates use the engine's deterministic
-- money pattern: SUM(CAST(ROUND(expr * 1eN) AS BIGINT)) / 1eN is exact and
-- order-independent, so Spark and the DuckDB oracle hash-match bit-for-bit.
SELECT
    l_returnflag,
    l_linestatus,
    SUM(CAST(ROUND(l_quantity * 1e2) AS BIGINT)) / 1e2 AS sum_qty,
    SUM(CAST(ROUND(l_extendedprice * 1e2) AS BIGINT)) / 1e2 AS sum_base_price,
    SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 1e4) AS BIGINT)) / 1e4 AS sum_disc_price,
    SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1e4) AS BIGINT)) / 1e4 AS sum_charge,
    SUM(CAST(ROUND(l_quantity * 1e2) AS BIGINT)) / 1e2 / COUNT(*) AS avg_qty,
    SUM(CAST(ROUND(l_extendedprice * 1e2) AS BIGINT)) / 1e2 / COUNT(*) AS avg_price,
    SUM(CAST(ROUND(l_discount * 1e4) AS BIGINT)) / 1e4 / COUNT(*) AS avg_disc,
    CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '2000-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
