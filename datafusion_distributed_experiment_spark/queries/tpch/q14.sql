-- Promotion effect (reference testdata/tpch/queries/q14.sql): percentage via
-- a CASE-guarded aggregate ratio over one month of shipments.
SELECT
    100e0 * SUM(CAST(ROUND(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0e0 END * 1e4) AS BIGINT))
      / SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 1e4) AS BIGINT)) AS promo_revenue
FROM lineitem, part
WHERE l_partkey = p_partkey
  AND l_shipdate >= DATE '1997-09-01'
  AND l_shipdate < DATE '1997-09-01' + INTERVAL 1 MONTH
