-- Best-balance supplier per part in a region (reference q2 shape: multi-way
-- join + correlated scalar subquery, reference testdata/tpch/queries/q2.sql;
-- partsupp is absent from the driver schema, so the part<->supplier link goes
-- through lineitem and "min supplycost" becomes "max supplier balance").
SELECT DISTINCT
    s_acctbal, s_name, n_name, p_partkey, p_name
FROM part, supplier, lineitem, nation, region
WHERE p_partkey = l_partkey
  AND s_suppkey = l_suppkey
  AND p_size <= 15
  AND p_type = 'STANDARD'
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'EUROPE'
  AND s_acctbal = (
      SELECT MAX(s2.s_acctbal)
      FROM supplier s2, lineitem l2, nation n2, region r2
      WHERE l2.l_partkey = p_partkey
        AND s2.s_suppkey = l2.l_suppkey
        AND s2.s_nationkey = n2.n_nationkey
        AND n2.n_regionkey = r2.r_regionkey
        AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
