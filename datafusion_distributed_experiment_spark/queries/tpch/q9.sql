-- Product-type profit (reference testdata/tpch/queries/q9.sql; ps_supplycost
-- is absent, so cost is modeled from p_retailprice).
SELECT
    nation,
    o_year,
    SUM(CAST(ROUND(amount * 1e4) AS BIGINT)) / 1e4 AS sum_profit
FROM (
    SELECT
        n_name AS nation,
        CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
        l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity * 0.1 AS amount
    FROM part, supplier, lineitem, orders, nation
    WHERE s_suppkey = l_suppkey
      AND p_partkey = l_partkey
      AND o_orderkey = l_orderkey
      AND s_nationkey = n_nationkey
      AND p_name LIKE '%bolt%'
) AS profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
