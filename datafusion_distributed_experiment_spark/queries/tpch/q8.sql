-- National market share (reference testdata/tpch/queries/q8.sql): 8-table
-- join, CASE WHEN inside an aggregate ratio, two nation roles.
SELECT
    o_year,
    SUM(CAST(ROUND(CASE WHEN nation = 'NATION_9' THEN volume ELSE 0e0 END * 1e4) AS BIGINT)) * 1e0
      / SUM(CAST(ROUND(volume * 1e4) AS BIGINT)) AS mkt_share
FROM (
    SELECT
        CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
        l_extendedprice * (1 - l_discount) AS volume,
        n2.n_name AS nation
    FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
    WHERE p_partkey = l_partkey
      AND s_suppkey = l_suppkey
      AND l_orderkey = o_orderkey
      AND o_custkey = c_custkey
      AND c_nationkey = n1.n_nationkey
      AND n1.n_regionkey = r_regionkey
      AND r_name = 'AMERICA'
      AND s_nationkey = n2.n_nationkey
      AND o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
      AND p_type = 'ECONOMY'
) AS all_nations
GROUP BY o_year
ORDER BY o_year
