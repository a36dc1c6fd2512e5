-- Discounted revenue, disjunctive predicate blocks (reference
-- testdata/tpch/queries/q19.sql): 3-way OR of conjunctions, BETWEEN on both
-- numeric and join columns.
SELECT
    SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 1e4) AS BIGINT)) / 1e4 AS revenue
FROM lineitem, part
WHERE (
        p_partkey = l_partkey
        AND p_brand = 'Brand#12'
        AND p_size BETWEEN 1 AND 15
        AND l_quantity >= 1 AND l_quantity <= 21
    ) OR (
        p_partkey = l_partkey
        AND p_brand = 'Brand#23'
        AND p_size BETWEEN 1 AND 20
        AND l_quantity >= 10 AND l_quantity <= 30
    ) OR (
        p_partkey = l_partkey
        AND p_brand = 'Brand#14'
        AND p_size BETWEEN 1 AND 25
        AND l_quantity >= 20 AND l_quantity <= 40
    )
