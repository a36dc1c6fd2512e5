-- Global sales opportunity (reference testdata/tpch/queries/q22.sql):
-- substring FROM/FOR, IN value-list, uncorrelated AVG subquery, NOT EXISTS
-- anti-join; c_phone is absent so the "country code" comes from c_name digits.
SELECT
    cntrycode,
    CAST(COUNT(*) AS BIGINT) AS numcust,
    SUM(CAST(ROUND(c_acctbal * 1e2) AS BIGINT)) / 1e2 AS totacctbal
FROM (
    SELECT
        substring(c_name FROM 16 FOR 1) AS cntrycode,
        c_acctbal,
        c_custkey
    FROM customer
    WHERE substring(c_name FROM 16 FOR 1) IN ('0', '1', '2', '3', '4', '5', '6')
      AND c_acctbal > (
          SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0e0)
) AS custsale
WHERE NOT EXISTS (
    SELECT * FROM orders
    WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
GROUP BY cntrycode
ORDER BY cntrycode
