-- Top supplier (reference testdata/tpch/queries/q15.sql). The reference runs
-- this as a 3-statement view script (create view; select; drop view —
-- reference benchmarks/src/tpch/run.rs:186-199); the engine supports that via
-- Engine.sql_script (tested in tests/test_engine.py). The oracle-comparable
-- form uses a CTE with identical semantics.
WITH revenue AS (
    SELECT
        l_suppkey AS supplier_no,
        SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 1e4) AS BIGINT)) / 1e4 AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= DATE '1997-01-01'
      AND l_shipdate < DATE '1997-01-01' + INTERVAL 3 MONTH
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier, revenue
WHERE s_suppkey = supplier_no
  AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
