"""Simulate the driver's CORRECTNESS harness end-to-end.

Round 1 failed because the driver constructs its OWN vanilla SparkSession
(none of the engine confs applied) and passes it into ``queries()``; the repo's
own pytest fixtures used ``build_session`` and so never saw the bug. This
script reproduces the driver's conditions exactly:

- a bare ``SparkSession.builder.master(...).getOrCreate()`` with ZERO engine
  confs (``Engine.__init__`` must retrofit them via ``configure_session``),
- sf0.01 data (the driver's correctness scale),
- order-insensitive value comparison vs the DuckDB oracle, columns sorted by
  name (mirrors the driver's value-hash).

Usage: python scripts/driver_sim.py [sf_dir]  (default /root/testdata/sf0.01)
Prints one line per query + a redcount summary; exit 1 on any red.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canonical(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return sorted(tuple(str(v) for v in row) for row in df.itertuples(index=False))


def main() -> int:
    from pyspark.sql import SparkSession

    import duckdb

    import __spark_entry__ as entry_mod

    # Vanilla session — deliberately NOT build_session().
    spark = (
        SparkSession.builder.appName("driver-sim")
        .master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    reds: list[str] = []
    t_total = time.time()
    for name in sorted(queries):
        t0 = time.time()
        try:
            sdf = queries[name](spark, SF_DIR).toPandas()
        except Exception as exc:  # noqa: BLE001
            reds.append(name)
            print(f"RED  {name}: spark error: {type(exc).__name__}: {str(exc)[:200]}")
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(sdf)} rows) {time.time() - t0:.1f}s")
            continue
        try:
            odf = duck.execute(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            reds.append(name)
            print(f"RED  {name}: oracle error: {type(exc).__name__}: {str(exc)[:200]}")
            continue
        s, o = canonical(sdf), canonical(odf)
        cols_ok = sorted(sdf.columns) == sorted(odf.columns)
        if not cols_ok:
            reds.append(name)
            print(f"RED  {name}: columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        elif len(s) != len(o):
            reds.append(name)
            print(f"RED  {name}: rows {len(s)} vs {len(o)}")
        elif s != o:
            reds.append(name)
            bad = next(i for i, (a, b) in enumerate(zip(s, o)) if a != b)
            print(f"RED  {name}: first diff row #{bad}:\n  spark={s[bad]}\n  duck ={o[bad]}")
        else:
            print(f"ok   {name}: {len(s)} rows {time.time() - t0:.1f}s")
    print(
        json.dumps(
            {
                "total": len(queries),
                "red": len(reds),
                "red_names": reds,
                "wall_sec": round(time.time() - t_total, 1),
            }
        )
    )
    return 1 if reds else 0


if __name__ == "__main__":
    raise SystemExit(main())
