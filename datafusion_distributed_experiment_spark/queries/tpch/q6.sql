-- Revenue-change forecast (reference testdata/tpch/queries/q6.sql): the
-- minimum end-to-end slice — scan, filter (pushed to parquet), aggregate.
SELECT
    SUM(CAST(ROUND(l_extendedprice * l_discount * 1e4) AS BIGINT)) / 1e4 AS revenue
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01'
  AND l_shipdate < DATE '1996-01-01' + INTERVAL 1 YEAR
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
