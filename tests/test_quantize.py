"""int8 scalar quantization invariants (oracle parity runs in the driver
sweep; these pin the code-space contract)."""

from __future__ import annotations

from datafusion_distributed_experiment_spark.operators.similarity import (
    embedding_quantize,
)
from datafusion_distributed_experiment_spark.plans import stage_summary

from .conftest import SF_DIR


def test_quantize_codes_are_int8_bounded(spark):
    rows = embedding_quantize(spark, SF_DIR).collect()
    assert rows, "empty corpus proves nothing"
    for r in rows:
        assert r.scale_ppm >= 1
        assert abs(r.q_first) <= 127 and abs(r.q_last) <= 127
        assert 0 <= r.q_l2 <= 127 * 127 * r.n_dims
        # the max-|component| element quantizes to exactly +/-127, so a
        # vector's code vector is never all-small: l2 >= 127^2
        assert r.q_l2 >= 127 * 127, r


def test_quantize_is_map_only(spark):
    s = stage_summary(embedding_quantize(spark, SF_DIR))
    assert s["aggregates"] == 0 and s["broadcasts"] == 0, s
    # only the output-order range exchange
    assert s["exchanges"] <= 1, s
