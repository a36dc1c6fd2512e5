-- Suppliers who kept orders waiting (reference testdata/tpch/queries/q21.sql):
-- lineitem self-joins via EXISTS and NOT EXISTS with <> inequality;
-- l_receiptdate/l_commitdate are absent, so "waiting" means this supplier
-- shipped strictly last among multi-supplier finished orders.
SELECT
    s_name,
    CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier, lineitem l1, orders, nation
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND EXISTS (
      SELECT * FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey
        AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
      SELECT * FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey
        AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_shipdate > l1.l_shipdate)
  AND s_nationkey = n_nationkey
  AND n_name = 'NATION_9'
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
