-- Potential part promotion (reference testdata/tpch/queries/q20.sql): nested
-- IN subqueries (2 levels) with LIKE and an aggregated HAVING.
SELECT
    s_name,
    s_acctbal,
    n_name
FROM supplier, nation
WHERE s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem
    WHERE l_partkey IN (
        SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      AND l_shipdate >= DATE '1997-01-01'
      AND l_shipdate < DATE '1997-01-01' + INTERVAL 1 YEAR
    GROUP BY l_suppkey
    HAVING SUM(CAST(ROUND(l_quantity * 1e2) AS BIGINT)) / 1e2 > 100e0)
  AND s_nationkey = n_nationkey
ORDER BY s_name
