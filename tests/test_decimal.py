"""Decimal money-column path (SURVEY §7.4's #1 hard part).

The reference types every money column ``Decimal128(15,2)``
(reference benchmarks/src/tpch/mod.rs:62,72,80,90,99,112-115) and ingests
``.tbl`` text into that schema (convert.rs). These tests pin the Spark
equivalent: DecimalType(15,2) ingestion via register_tbl, exact fixed-point
aggregation, and the precision/scale promotion rules the corpus's
q1_decimal query is designed around."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

_TBL_SCHEMA = (
    "l_returnflag STRING, l_quantity DECIMAL(15,2), l_extendedprice DECIMAL(15,2), "
    "l_discount DECIMAL(15,2), l_tax DECIMAL(15,2)"
)


def _write_tbl(engine, tmp_path):
    rows = engine.sql(
        "SELECT l_returnflag, l_quantity, l_extendedprice, l_discount, l_tax "
        "FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 200"
    ).collect()
    tbl = tmp_path / "lineitem_money.tbl"
    tbl.write_text(
        "".join(
            f"{r.l_returnflag}|{r.l_quantity:.2f}|{r.l_extendedprice:.2f}"
            f"|{r.l_discount:.2f}|{r.l_tax:.2f}|\n"
            for r in rows
        )
    )
    return tbl


def test_tbl_ingests_decimal_schema(engine, tmp_path):
    """.tbl text -> DecimalType(15,2) columns, exactly (no double detour)."""
    tbl = _write_tbl(engine, tmp_path)
    df = engine.register_tbl("lineitem_money", str(tbl), _TBL_SCHEMA)
    dtypes = dict(df.dtypes)
    assert dtypes["l_extendedprice"] == "decimal(15,2)", dtypes
    first = df.limit(1).collect()[0]
    assert isinstance(first.l_extendedprice, Decimal)


def test_decimal_q1_aggregate_matches_duckdb_exactly(engine, duck, tmp_path):
    """q1-shape aggregate over DECIMAL(15,2): sums must match DuckDB digit
    for digit (decimal aggregation is exact and order-independent — the
    property the DOUBLE corpus needs ROUND() workarounds to fake)."""
    tbl = _write_tbl(engine, tmp_path)
    engine.register_tbl("lineitem_money", str(tbl), _TBL_SCHEMA)
    q = """
        SELECT l_returnflag,
               SUM(l_quantity) AS sum_qty,
               SUM(l_extendedprice) AS sum_base_price,
               SUM(l_extendedprice * (CAST(1 AS DECIMAL(4,2)) - l_discount)) AS sum_disc_price,
               COUNT(*) AS n
        FROM lineitem_money GROUP BY l_returnflag ORDER BY l_returnflag
    """
    spark_rows = engine.sql(q).collect()

    duck.execute(
        f"""CREATE OR REPLACE VIEW lineitem_money AS
        SELECT * FROM read_csv('{tbl}', delim='|', header=false,
            columns={{'l_returnflag': 'VARCHAR', 'l_quantity': 'DECIMAL(15,2)',
                      'l_extendedprice': 'DECIMAL(15,2)', 'l_discount': 'DECIMAL(15,2)',
                      'l_tax': 'DECIMAL(15,2)', 'ph': 'VARCHAR'}})"""
    )
    duck_rows = duck.execute(q).fetchall()
    assert len(spark_rows) == len(duck_rows) > 0
    for s, d in zip(spark_rows, duck_rows):
        assert s.l_returnflag == d[0]
        # exact decimal equality, not approx: Decimal("123.45") == Decimal("123.45")
        assert s.sum_qty == d[1], (s, d)
        assert s.sum_base_price == d[2], (s, d)
        assert s.sum_disc_price == d[3], (s, d)
        assert s.n == d[4]


def test_decimal_promotion_rules_pinned(engine):
    """Pin the promotion behavior q1_decimal relies on (SURVEY §7.4):

    - products sized to fit 38 digits keep their exact scale (no loss);
    - with spark.sql.decimalOperations.allowPrecisionLoss=true (default),
      an overflowing product is rescaled to precision 38 with at least
      6 fractional digits instead of erroring."""
    assert (
        engine.spark.conf.get("spark.sql.decimalOperations.allowPrecisionLoss", "true")
        == "true"
    )
    df = engine.spark.range(1).select(
        (
            F.lit("2.50").cast("decimal(15,2)")
            * F.lit("0.95").cast("decimal(5,2)")
            * F.lit("1.05").cast("decimal(5,2)")
        ).alias("fits"),
        (
            F.lit("2.5").cast("decimal(38,10)") * F.lit("0.9").cast("decimal(38,10)")
        ).alias("overflows"),
    )
    dtypes = dict(df.dtypes)
    assert dtypes["fits"] == "decimal(27,6)", dtypes  # exact: 15+5+1 then +5+1 digits
    assert dtypes["overflows"] == "decimal(38,6)", dtypes  # rescaled, min 6 frac digits
    row = df.collect()[0]
    assert row.fits == Decimal("2.493750")
