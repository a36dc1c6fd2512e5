#!/usr/bin/env python
"""Staged-operator correctness gate.

Staged operators (``operators.staged_queries()`` — built this round, no
driver-window slot until the next rotation) get the exact check the driver
would run, at the driver's scale: Spark result vs DuckDB oracle over the
same parquet tables, row count + column names + order-insensitive value
hash. ``tests/test_staged_oracle.py`` runs this at sf0.001 in every pytest
run; this script is the sf0.01 sweep recorded in GATE.txt.

Usage: python scripts/verify_staged.py [sf_dir]
Exit 0 = every staged operator hash-matches.
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from verify_correctness import TABLES, canonical_hash  # noqa: E402


def main() -> int:
    from datafusion_distributed_experiment_spark import build_session
    from datafusion_distributed_experiment_spark.operators import (
        staged_oracles,
        staged_queries,
    )

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    spark = build_session(
        app_name="verify-staged",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries, oracles = staged_queries(), staged_oracles()
    failures: list[str] = []
    for name, fn in queries.items():
        t0 = time.perf_counter()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failures.append(name)
            continue
        finally:
            spark.catalog.clearCache()  # evict per-query persist()s
        try:
            # guarded like verify_correctness: a missing/erroring oracle
            # records a FAIL and lets the remaining staged ops verify
            odf = con.execute(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            failures.append(name)
            continue
        problems = []
        if len(sdf) == 0:
            problems.append("empty result proves nothing")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"columns {sorted(sdf.columns)} != {sorted(odf.columns)}")
        elif len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} != {len(odf)}")
        elif canonical_hash(sdf) != canonical_hash(odf):
            problems.append("hash mismatch")
        dt = time.perf_counter() - t0
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            print(f"PASS {name}: rows={len(sdf)} hash match [{dt:.1f}s]")

    print(f"\n{len(queries) - len(failures)}/{len(queries)} staged passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
