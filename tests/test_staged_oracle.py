"""Cross-engine oracle check for STAGED operators — the ones built this
round that hold no driver-gate window slot yet (round 6's window is fully
spent on the rotation; see ``operators.staged_tiers``). This test gives them
the exact check the driver would run: Spark result vs DuckDB oracle over the
same parquet tables, order-insensitive value comparison. When a staged
operator is promoted into the window, it keeps this coverage for free until
the promotion commit removes it from the staged registry.
"""

from __future__ import annotations

import pytest

from datafusion_distributed_experiment_spark.operators import (
    staged_oracles,
    staged_queries,
)

from ._compare import assert_frames_match
from .conftest import SF_DIR

_QUERIES = staged_queries()
_ORACLES = staged_oracles()


def test_every_staged_query_has_an_oracle():
    assert set(_QUERIES) == set(_ORACLES)


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_staged_operator_matches_oracle(spark, duck, name):
    spark_df = _QUERIES[name](spark, SF_DIR).toPandas()
    oracle_df = duck.execute(_ORACLES[name]).df()
    assert len(spark_df) > 0, f"{name}: empty result proves nothing"
    assert_frames_match(spark_df, oracle_df, name)
