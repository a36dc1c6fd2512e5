-- Top supplier, in the reference's actual 3-statement form: create view;
-- select; drop view (reference testdata/tpch/queries/q15.sql:1,31 executed by
-- benchmarks/src/tpch/run.rs:186-199). The driver-facing q15 entry runs THIS
-- text through Engine.sql_script (statement 1 is the result); the DuckDB
-- oracle runs the semantically-identical single-statement CTE in q15.sql.
CREATE OR REPLACE TEMPORARY VIEW revenue_view AS
SELECT
    l_suppkey AS supplier_no,
    SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 1e4) AS BIGINT)) / 1e4 AS total_revenue
FROM lineitem
WHERE l_shipdate >= DATE '1997-01-01'
  AND l_shipdate < DATE '1997-01-01' + INTERVAL 3 MONTH
GROUP BY l_suppkey;

SELECT s_suppkey, s_name, total_revenue
FROM supplier, revenue_view
WHERE s_suppkey = supplier_no
  AND total_revenue = (SELECT MAX(total_revenue) FROM revenue_view)
ORDER BY s_suppkey;

DROP VIEW revenue_view
