-- Customer order-count distribution (reference testdata/tpch/queries/q13.sql):
-- LEFT OUTER JOIN with compound ON (equi + NOT LIKE residual), derived table
-- with a column-alias list, COUNT(col) vs COUNT(*).
SELECT
    c_count,
    CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
    SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT)
    FROM customer
    LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '%SPECI%IED%'
    GROUP BY c_custkey
) AS c_orders (c_custkey, c_count)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
