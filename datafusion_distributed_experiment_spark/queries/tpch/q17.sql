-- Small-quantity-order revenue (reference testdata/tpch/queries/q17.sql):
-- correlated scalar AVG subquery per part.
SELECT
    SUM(CAST(ROUND(l_extendedprice * 1e4) AS BIGINT)) / 1e4 / 7e0 AS avg_yearly
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand = 'Brand#3'
  AND p_type = 'SMALL'
  AND l_quantity < (
      SELECT 0.4 * AVG(l_quantity)
      FROM lineitem l2
      WHERE l2.l_partkey = p_partkey)
