"""weighted_sample (priority sampling) semantics beyond the oracle check:
sample-size/rank contract, the integer priority surrogate replayed in pure
Python, weight monotonicity at fixed hash, and partition-count determinism."""

from __future__ import annotations

from datafusion_distributed_experiment_spark.operators.curation import (
    WSAMPLE_K,
    _WSAMPLE_HASH_HEX,
    _WSAMPLE_HASH_MOD,
    weighted_sample,
)

from .conftest import SF_DIR


def _py_hash32(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:_WSAMPLE_HASH_HEX], 16)


def test_sample_contract_and_priority_replay(spark, duck):
    rows = weighted_sample(spark, SF_DIR).collect()
    assert [r["rank"] for r in rows] == list(range(1, WSAMPLE_K + 1))
    # priorities non-increasing with rank, ties broken by doc_id
    for a, b in zip(rows, rows[1:]):
        assert (a["priority_x"], -a["doc_id"]) >= (b["priority_x"], -b["doc_id"])
    # the integer surrogate is a pure function of (weight, doc_id)
    true_chars = dict(
        duck.execute("SELECT doc_id, n_chars FROM documents").fetchall()
    )
    for r in rows:
        w = max(true_chars[r["doc_id"]], 1)
        assert r["weight"] == w
        h1 = _py_hash32(str(r["doc_id"])) + 1
        assert r["priority_x"] == (w * _WSAMPLE_HASH_MOD) // h1, r


def test_heavier_weight_can_only_raise_priority():
    """Priority q = w * MOD // (h+1) is monotone in w at fixed hash — the
    property that makes the draw weight-proportional."""
    for h1 in (1, 17, _WSAMPLE_HASH_MOD):
        qs = [(w * _WSAMPLE_HASH_MOD) // h1 for w in (1, 10, 1000, 10**6)]
        assert qs == sorted(qs)


def test_sample_is_partition_count_independent(spark):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        single = [tuple(r) for r in weighted_sample(spark, SF_DIR).collect()]
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        distributed = [tuple(r) for r in weighted_sample(spark, SF_DIR).collect()]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert single == distributed


def test_shard_shuffle_actually_permutes(spark):
    """Regression pin for the magnitude-uniform hash switch: within a
    shard, documents ordered by pos must NOT be in doc_id order (the old
    poly_hash magnitude was monotone in same-length doc_ids, so the
    'shuffle' degenerated to doc_id order — defeating the point of
    shuffling a training corpus)."""
    from datafusion_distributed_experiment_spark.operators.curation import (
        shuffle_shards,
    )

    rows = shuffle_shards(spark, SF_DIR).collect()
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["doc_id"])  # pos order
    scrambled = sum(
        1 for docs in by_shard.values() if docs != sorted(docs) and len(docs) > 2
    )
    assert scrambled == sum(1 for d in by_shard.values() if len(d) > 2), by_shard


def test_stratified_sample_is_not_first_k_by_doc_id(spark):
    """Same regression pin for the per-stratum sample: the selected docs
    must not simply be each stratum's k smallest doc_ids."""
    from datafusion_distributed_experiment_spark.operators.curation import (
        SAMPLE_PER_STRATUM,
        stratified_sample,
    )

    sample = stratified_sample(spark, SF_DIR).collect()
    strata: dict[tuple, list[int]] = {}
    for r in sample:
        strata.setdefault((r["lang"], r["source"]), []).append(r["doc_id"])
    full = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id", "lang", "source")
        .collect()
    )
    pool: dict[tuple, list[int]] = {}
    for r in full:
        pool.setdefault((r["lang"], r["source"]), []).append(r["doc_id"])
    degenerate = sum(
        1
        for k, docs in strata.items()
        if len(pool[k]) > len(docs)
        and sorted(docs) == sorted(pool[k])[: len(docs)]
    )
    assert degenerate == 0, degenerate


def test_priority_sampling_subset_sum_estimator(duck):
    """The Duffield-Lund-Thorup guarantee the scheme exists for: with tau =
    the (k+1)-th priority, the estimator sum over the sample of
    max(w_i, tau) is UNBIASED for the total corpus weight. q = w*MOD//h1 is
    w/u in weight units already (u = h1/MOD), so tau needs no rescale.
    Unbiasedness is a statement over the u-randomness, so it is tested over
    50 independently-salted draws in pure Python (one draw's relative sd at
    k=100 is ~8-9%; the shipped draw just gets a 4-sd sanity bound)."""
    import statistics

    from datafusion_distributed_experiment_spark.operators.curation import (
        WSAMPLE_K,
        _WSAMPLE_HASH_MOD,
    )

    rows = duck.execute(
        "SELECT doc_id, GREATEST(n_chars, 1) FROM documents WHERE n_chars IS NOT NULL"
    ).fetchall()
    total = sum(w for _, w in rows)

    def draw(salt):
        pri = sorted(
            ((w * _WSAMPLE_HASH_MOD) // (_py_hash32(f"{salt}:{d}") + 1), w)
            for d, w in rows
        )[::-1]
        tau = pri[WSAMPLE_K][0]
        return sum(max(w, tau) for _, w in pri[:WSAMPLE_K])

    ests = [draw(s) for s in range(50)]
    mean_err = abs(statistics.mean(ests) - total) / total
    assert mean_err < 0.03, (statistics.mean(ests), total)
    sd = statistics.stdev(ests) / total
    assert sd < 0.20, sd
    # the SHIPPED draw (unsalted hash, the operator's own order) stays
    # inside a 4-sd band of the unbiased mean
    pri0 = sorted(
        ((w * _WSAMPLE_HASH_MOD) // (_py_hash32(str(d)) + 1), w) for d, w in rows
    )[::-1]
    tau0 = pri0[WSAMPLE_K][0]
    est0 = sum(max(w, tau0) for _, w in pri0[:WSAMPLE_K])
    assert abs(est0 - total) / total < 4 * sd, (est0, total, sd)


def test_priority_headroom_guard():
    """Trip + pass paths of the cross-multiplication guard (the
    pagerank/bm25/dsir/cms pattern): weight * 2^32 must stay in int64 —
    past the bound Spark's non-ANSI multiply wraps silently while the
    DuckDB oracle raises, so the engines would diverge instead of
    failing loudly."""
    import pytest

    from datafusion_distributed_experiment_spark.errors import PlanningError
    from datafusion_distributed_experiment_spark.operators.curation import (
        _WSAMPLE_HASH_MOD,
        check_priority_headroom,
    )

    bound = (2**63 - 1) // _WSAMPLE_HASH_MOD
    check_priority_headroom(bound)  # a ~2-GB document: exactly at the bound
    with pytest.raises(PlanningError, match="int64 headroom"):
        check_priority_headroom(bound + 1)


def test_parquet_column_max_walks_nested_layouts(tmp_path):
    """Footer-stat guard input must never under-report on a partitioned
    layout: a directory mixing top-level data files with nested
    partition dirs takes the max over the WHOLE tree, and any
    non-parquet data file in the tree (incomplete listing) returns None
    so the caller's MAX-aggregate fallback runs (round-8 advisory)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from datafusion_distributed_experiment_spark.operators.curation import (
        _parquet_column_max,
    )

    root = tmp_path / "documents.parquet"
    nested = root / "domain=web"
    nested.mkdir(parents=True)
    pq.write_table(pa.table({"n_chars": [10, 20]}), root / "part-0.parquet")
    pq.write_table(pa.table({"n_chars": [99, 5]}), nested / "part-1.parquet")
    (root / "_SUCCESS").write_text("")  # sidecar: ignored, not incomplete
    assert _parquet_column_max(str(tmp_path), "documents", "n_chars") == 99

    (nested / "data.orc").write_bytes(b"ORC")  # unlistable data file
    assert _parquet_column_max(str(tmp_path), "documents", "n_chars") is None


def test_domain_mix_sub_ppm_source_survives(spark, tmp_path):
    """Review-found latent drop (round 11): a source under 1 ppm of corpus
    tokens floors to share_ppm = 0, and an unclamped weight division by it
    is NULL on both engines — domain_resample's n_copies > 0 filter then
    silently erased exactly the long-tail domain temperature resampling
    exists to upsample. The clamped divisor (greatest(share, 1)) gives it
    the maximum upsample weight instead; share_ppm still reports 0."""
    from datafusion_distributed_experiment_spark.operators.curation import (
        domain_mix,
        domain_resample,
    )

    big = "tok " * 2_000_000  # 2e6 tokens => the 1-token source is 0.49 ppm
    spark.createDataFrame(
        [(1, big, "en", "head", len(big)), (2, "solo", "en", "tail", 4)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))

    mix = {r["source"]: r for r in domain_mix(spark, str(tmp_path)).collect()}
    assert mix["tail"]["share_ppm"] == 0, "true share still reported"
    target = 500_000  # floor(1e6 / 2 sources)
    assert mix["tail"]["weight_ppm"] == 1_000_000 * target, "clamped divisor"
    assert mix["head"]["weight_ppm"] is not None
    res = {r["doc_id"]: r["n_copies"] for r in domain_resample(spark, str(tmp_path)).collect()}
    assert res.get(2, 0) > 0, "the sub-ppm source's document must survive"
