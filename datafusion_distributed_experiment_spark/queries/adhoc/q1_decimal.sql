-- q1-shape pricing summary computed on DECIMAL money columns — the
-- reference types every money column Decimal128(15,2)
-- (benchmarks/src/tpch/mod.rs:62,72,80,90,99,112-115); the driver's parquet
-- stores DOUBLE, so ingestion casts to the reference's decimal schema first.
-- All arithmetic is exact fixed-point (operands sized so every product stays
-- inside DECIMAL(38,_) on both engines — no precision-loss rescaling kicks
-- in); SUMs over decimals are order-independent, so no ROUND() workaround is
-- needed. Final casts to DOUBLE only normalize the *output representation*
-- (DuckDB hands pandas float64 for decimals, Spark hands decimal.Decimal):
-- both engines convert the identical exact decimal to the nearest double.
WITH l AS (
    SELECT
        l_returnflag,
        l_linestatus,
        CAST(l_quantity AS DECIMAL(15,2)) AS qty,
        CAST(l_extendedprice AS DECIMAL(15,2)) AS price,
        CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)) AS disc_factor,
        CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)) AS tax_factor
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
)
SELECT
    l_returnflag,
    l_linestatus,
    CAST(SUM(qty) AS DOUBLE) AS sum_qty,
    CAST(SUM(price) AS DOUBLE) AS sum_base_price,
    CAST(SUM(price * disc_factor) AS DOUBLE) AS sum_disc_price,
    CAST(SUM(price * disc_factor * tax_factor) AS DOUBLE) AS sum_charge,
    COUNT(*) AS count_order
FROM l
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
