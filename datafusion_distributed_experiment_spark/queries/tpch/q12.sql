-- Shipping-mode / priority split (reference testdata/tpch/queries/q12.sql;
-- l_shipmode is absent, so the CASE buckets use o_orderpriority and grouping
-- uses l_linestatus). Explicit JOIN ... ON form (reference q12 uses it too).
SELECT
    l_linestatus,
    CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
    CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_shipdate >= DATE '1997-01-01'
  AND l_shipdate < DATE '1997-01-01' + INTERVAL 1 YEAR
GROUP BY l_linestatus
ORDER BY l_linestatus
