-- Volume shipping between two nations (reference testdata/tpch/queries/q7.sql):
-- nation self-join with aliases n1/n2, derived table, EXTRACT(YEAR ...).
SELECT
    supp_nation,
    cust_nation,
    l_year,
    SUM(CAST(ROUND(volume * 1e4) AS BIGINT)) / 1e4 AS revenue
FROM (
    SELECT
        n1.n_name AS supp_nation,
        n2.n_name AS cust_nation,
        CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS l_year,
        l_extendedprice * (1 - l_discount) AS volume
    FROM supplier, lineitem, orders, customer, nation n1, nation n2
    WHERE s_suppkey = l_suppkey
      AND o_orderkey = l_orderkey
      AND c_custkey = o_custkey
      AND s_nationkey = n1.n_nationkey
      AND c_nationkey = n2.n_nationkey
      AND ((n1.n_name = 'NATION_6' AND n2.n_name = 'NATION_9')
        OR (n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_6'))
      AND l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
) AS shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
