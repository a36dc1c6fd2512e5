-- Important stock identification (reference testdata/tpch/queries/q11.sql;
-- partsupp is absent, so "value" is lineitem volume by supplier nation).
-- HAVING with an uncorrelated scalar subquery threshold.
SELECT
    n_name,
    SUM(CAST(ROUND(l_extendedprice * l_quantity * 1e2) AS BIGINT)) / 1e2 AS total_value
FROM lineitem, supplier, nation
WHERE l_suppkey = s_suppkey
  AND s_nationkey = n_nationkey
GROUP BY n_name
HAVING SUM(CAST(ROUND(l_extendedprice * l_quantity * 1e2) AS BIGINT)) / 1e2 > (
    SELECT SUM(CAST(ROUND(l_extendedprice * l_quantity * 1e2) AS BIGINT)) / 1e2 * 0.05
    FROM lineitem, supplier, nation
    WHERE l_suppkey = s_suppkey
      AND s_nationkey = n_nationkey)
ORDER BY total_value DESC, n_name
