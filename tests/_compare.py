"""Order-insensitive cross-engine result comparison (the test-suite analog of
the reference's pretty-printed-batch equality, reference tests/tpch.rs:190-192)."""

from __future__ import annotations

import pandas as pd


def canonical(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = [tuple(str(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows)


def assert_frames_match(spark_df: pd.DataFrame, oracle_df: pd.DataFrame, name: str = "") -> None:
    assert sorted(spark_df.columns) == sorted(oracle_df.columns), (
        f"{name}: columns differ: {sorted(spark_df.columns)} vs {sorted(oracle_df.columns)}"
    )
    s, o = canonical(spark_df), canonical(oracle_df)
    assert len(s) == len(o), f"{name}: row counts differ: {len(s)} vs {len(o)}"
    for i, (a, b) in enumerate(zip(s, o)):
        assert a == b, f"{name}: first differing row #{i}: spark={a} oracle={b}"
