-- Large-volume customers (reference testdata/tpch/queries/q18.sql): IN over
-- an aggregated GROUP BY ... HAVING subquery, top-100.
SELECT
    c_name,
    c_custkey,
    o_orderkey,
    o_orderdate,
    o_totalprice,
    SUM(CAST(ROUND(l_quantity * 1e2) AS BIGINT)) / 1e2 AS sum_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (
    SELECT l_orderkey
    FROM lineitem
    GROUP BY l_orderkey
    HAVING SUM(CAST(ROUND(l_quantity * 1e2) AS BIGINT)) / 1e2 > 250e0)
  AND c_custkey = o_custkey
  AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
