-- Order priority checking (reference testdata/tpch/queries/q4.sql): correlated
-- EXISTS semi-join; l_commitdate/l_receiptdate are absent, so "late" means
-- shipped more than 30 days after order date. The lower bound deliberately
-- uses an implicit string->date comparison (reference q4.sql:6 relies on it).
SELECT
    o_orderpriority,
    CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= '1997-07-01'
  AND o_orderdate < DATE '1997-07-01' + INTERVAL 3 MONTH
  AND EXISTS (
      SELECT * FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
