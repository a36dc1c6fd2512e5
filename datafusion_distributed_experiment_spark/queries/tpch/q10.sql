-- Returned-item reporting (reference testdata/tpch/queries/q10.sql, minus the
-- absent address/phone/comment columns). Top 20 by lost revenue.
SELECT
    c_custkey,
    c_name,
    SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 1e4) AS BIGINT)) / 1e4 AS revenue,
    c_acctbal,
    n_name,
    c_mktsegment
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate >= DATE '1996-10-01'
  AND o_orderdate < DATE '1996-10-01' + INTERVAL 3 MONTH
  AND l_returnflag = 'R'
  AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
ORDER BY revenue DESC, c_custkey
LIMIT 20
