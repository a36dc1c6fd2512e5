-- Parts/supplier relationship (reference testdata/tpch/queries/q16.sql):
-- COUNT(DISTINCT), <>, NOT LIKE, IN value-list, NOT IN subquery.
SELECT
    p_brand,
    p_type,
    p_size,
    CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand <> 'Brand#1'
  AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 2, 3, 4, 5, 10, 15, 20)
  AND l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 500e0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
