-- Shipping priority (reference testdata/tpch/queries/q3.sql; o_shippriority
-- is absent, o_orderpriority stands in). Deterministic LIMIT: the full ORDER
-- BY key chain ends in the unique l_orderkey.
SELECT
    l_orderkey,
    SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 1e4) AS BIGINT)) / 1e4 AS revenue,
    o_orderdate,
    o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < DATE '1998-03-15'
  AND l_shipdate > DATE '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
