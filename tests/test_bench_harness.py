"""Unit tests for the bench harness logic (no JVM): interleaved pass order,
failure isolation, min/spread estimators, and measure-last tier ordering."""

from __future__ import annotations

from datafusion_distributed_experiment_spark.bench import (
    FLOOR_EXTRA,
    headline_seconds,
    mean_iter_seconds,
    mean_seconds,
    run_benchmark,
    spread_ratio,
)


class _FakeSpark:
    version = "test"


class _FakeDF:
    def __init__(self, rows):
        self._rows = rows

    def collect(self):
        if isinstance(self._rows, Exception):
            raise self._rows
        return [None] * self._rows


def _q(log, name, rows=1):
    def fn(spark, sf_dir):
        log.append(name)
        return _FakeDF(rows)

    return fn


def test_interleaved_passes_and_measure_last_tier():
    log: list[str] = []
    tiers = [
        ("streaming", {"s1": _q(log, "s1")}),  # listed first, must run LAST
        ("sql", {"a": _q(log, "a"), "b": _q(log, "b")}),
    ]
    results = run_benchmark(
        _FakeSpark(), None, "sf", iterations=2, warmup=False, tiers=tiers,
        clear_cache=False, warm_epoch=False,
    )
    # pass 1 of every query precedes pass 2 of any; streaming at each pass
    # end; then per-query consecutive floor passes, streaming tier still last
    floors = ["a"] * FLOOR_EXTRA + ["b"] * FLOOR_EXTRA + ["s1"] * FLOOR_EXTRA
    assert log == ["a", "b", "s1", "a", "b", "s1", *floors], log
    assert all(len(e["iterations"]) == 2 + FLOOR_EXTRA for e in results["queries"])
    assert [e["tier"] for e in results["queries"]] == ["sql", "sql", "streaming"]


def test_warm_epoch_runs_everything_once_unmeasured():
    log: list[str] = []
    tiers = [("sql", {"a": _q(log, "a"), "b": _q(log, "b")})]
    results = run_benchmark(
        _FakeSpark(), None, "sf", iterations=1, warmup=False, tiers=tiers,
        clear_cache=False, warm_epoch=True,
    )
    assert log == ["a", "b", "a", "b"]  # epoch + one measured pass
    assert all(len(e["iterations"]) == 1 for e in results["queries"])


def test_failing_query_is_isolated_and_skipped_in_later_passes():
    log: list[str] = []
    tiers = [
        ("sql", {
            "ok": _q(log, "ok"),
            "boom": lambda spark, sf: _FakeDF(RuntimeError("kaput")),
            "after": _q(log, "after"),
        })
    ]
    results = run_benchmark(
        _FakeSpark(), None, "sf", iterations=3, warmup=False, tiers=tiers,
        clear_cache=False, warm_epoch=False,
    )
    by_name = {e["query"]: e for e in results["queries"]}
    assert by_name["boom"]["success"] is False
    assert "kaput" in by_name["boom"]["error"]
    assert not by_name["boom"]["iterations"]
    # neighbors unaffected: all passes + floor iterations measured
    assert len(by_name["ok"]["iterations"]) == 3 + FLOOR_EXTRA
    assert len(by_name["after"]["iterations"]) == 3 + FLOOR_EXTRA


def test_min_estimator_and_spread():
    entry = {"iterations": [{"elapsed_ms": v} for v in (1058.0, 11500.0, 10329.0, 800.0, 770.0)]}
    assert headline_seconds(entry) == 0.77  # min recovers the uncontaminated cost
    assert mean_seconds is headline_seconds  # compat alias
    assert spread_ratio(entry) == round(11500.0 / 770.0, 2)
    assert headline_seconds({"iterations": []}) is None
    assert spread_ratio({"iterations": [{"elapsed_ms": 5.0}]}) is None
    # reference-protocol mean (BenchQuery::avg, util/run.rs:263-270)
    assert mean_iter_seconds(entry) == (1058.0 + 11500.0 + 10329.0 + 800.0 + 770.0) / 5 / 1000
    assert mean_iter_seconds({"iterations": []}) is None


def test_compare_runs_flags_mean_only_regression():
    """A query whose min is stable but whose mean regresses past the 1.2x
    threshold (the intermittent spill/GC class the min estimator cannot
    see) must be called out, not read as silently green."""
    from datafusion_distributed_experiment_spark.bench import compare_runs

    def entry(name, ms):
        return {"query": name, "iterations": [{"elapsed_ms": v} for v in ms]}

    prev = {"queries": [entry("q", [100.0] * 3), entry("r", [100.0] * 3)]}
    cur = {"queries": [entry("q", [100.0, 550.0, 550.0]), entry("r", [100.0] * 3)]}
    lines = compare_runs(cur, prev)
    qline = next(line for line in lines if line.startswith("q:"))
    rline = next(line for line in lines if line.startswith("r:"))
    assert "no change" in qline and "MEAN-REGRESSED" in qline
    assert "[mean " in qline  # both estimators visible on every line
    assert "MEAN-REGRESSED" not in rline
    # a regression BOTH estimators see is a plain slower verdict, not the flag
    cur2 = {"queries": [entry("q", [300.0, 300.0, 300.0])]}
    (qline2,) = compare_runs(cur2, prev)
    assert "slower" in qline2 and "MEAN-REGRESSED" not in qline2


def test_every_query_gets_consecutive_floor_passes(monkeypatch):
    """After the interleaved passes EVERY query gets FLOOR_EXTRA extra
    consecutive iterations (tagged 'floor') — unconditionally, so two
    back-to-back runs always sample the identical regimes (a
    spread-conditional version made runs incomparable: whichever run
    triggered more re-runs read a lower warm-floor minimum)."""
    from datafusion_distributed_experiment_spark import bench as bench_mod

    # Scripted clock: perf_counter is called exactly twice per measured
    # iteration (t0, then elapsed); feed deltas in call order.
    # interleaved passes: a .2s, b .2s | a 1.0s, b .2s
    # floor passes: FLOOR_EXTRA x .1s for a, then for b (consecutive)
    deltas = iter([0.2, 0.2, 1.0, 0.2] + [0.1] * (2 * FLOOR_EXTRA))
    clock = {"t": 0.0, "pending": None}

    def fake_perf_counter():
        if clock["pending"] is None:
            clock["pending"] = next(deltas)
            return clock["t"]
        clock["t"] += clock["pending"]
        clock["pending"] = None
        return clock["t"]

    monkeypatch.setattr(bench_mod.time, "perf_counter", fake_perf_counter)
    log: list[str] = []
    tiers = [("sql", {"a": _q(log, "a"), "b": _q(log, "b")})]
    results = run_benchmark(
        _FakeSpark(), None, "sf", iterations=2, warmup=False, tiers=tiers,
        clear_cache=False, warm_epoch=False,
    )
    # execution order: interleaved (a b a b) then consecutive floors per query
    assert log == ["a", "b", "a", "b"] + ["a"] * FLOOR_EXTRA + ["b"] * FLOOR_EXTRA, log
    by_name = {e["query"]: e for e in results["queries"]}
    for name in ("a", "b"):
        assert len(by_name[name]["iterations"]) == 2 + FLOOR_EXTRA
        assert all(i.get("floor") for i in by_name[name]["iterations"][2:])
        # the floor passes are what the min estimator reads
        assert headline_seconds(by_name[name]) == 0.1


def test_prepare_sorted_dir_preserves_results(spark, tmp_path):
    """--sorted analog (reference options.rs:60-66): the clustered rewrite
    must (a) produce every source table, (b) leave query results identical,
    and (c) lay lineitem out in narrow disjoint l_shipdate intervals per
    file so min/max stats prune selective scans."""
    import os

    import pyarrow.parquet as pq

    from datafusion_distributed_experiment_spark.bench import prepare_sorted_dir
    from .conftest import SF_DIR

    dest = prepare_sorted_dir(spark, SF_DIR, str(tmp_path / "sorted"))
    for t in ("lineitem", "orders", "events", "embeddings"):
        assert os.path.exists(os.path.join(dest, f"{t}.parquet")), t

    q = "SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS s, COUNT(*) AS n FROM {t}"
    plain = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    plain.createOrReplaceTempView("li_plain")
    spark.read.parquet(f"{dest}/lineitem.parquet").createOrReplaceTempView("li_sorted")
    assert (
        spark.sql(q.format(t="li_plain")).collect()
        == spark.sql(q.format(t="li_sorted")).collect()
    )

    # clustered layout: per-file l_shipdate min/max intervals are disjoint
    # (allowing single-point overlap at range-partition boundaries)
    files = sorted(
        os.path.join(dest, "lineitem.parquet", f)
        for f in os.listdir(os.path.join(dest, "lineitem.parquet"))
        if f.endswith(".parquet")
    )
    spans = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "l_shipdate"
        )
        stats = [md.row_group(g).column(idx).statistics for g in range(md.num_row_groups)]
        spans.append((min(s.min for s in stats), max(s.max for s in stats)))
    spans.sort()
    assert len(spans) > 1
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, (hi1, lo2)


def test_compare_runs_refuses_partial_baseline():
    from datafusion_distributed_experiment_spark.bench import compare_runs

    prev = {
        "context": {"partial": ["q9", "bm25_topk"]},
        "queries": [
            {"query": "q9", "iterations": [{"elapsed_ms": 100.0, "row_count": 1}]}
        ],
    }
    cur = {
        "queries": [
            {"query": "q9", "iterations": [{"elapsed_ms": 500.0, "row_count": 1}]}
        ]
    }
    lines = compare_runs(cur, prev)
    assert len(lines) == 1 and "PARTIAL" in lines[0] and "refused" in lines[0]
    # a full previous run still compares normally
    del prev["context"]["partial"]
    assert any("q9" in l for l in compare_runs(cur, prev))


def test_measured_iterations_evict_cross_query_memos():
    """Round-8 advisory fix: the minhash pair-graph memo (localCheckpoint
    blocks OUTSIDE the catalog cache, deliberately shared by the driver's
    correctness pass) must NOT survive the bench's between-query eviction —
    a measured dedup_clusters iteration that reuses it skips the LSH mine,
    its documented dominant cost, and times a different job."""
    from datafusion_distributed_experiment_spark.operators import dedup

    class _Catalog:
        def clearCache(self):
            pass

    class _CatalogSpark(_FakeSpark):
        catalog = _Catalog()

    class _FakeCheckpoint:
        unpersisted = 0

        def unpersist(self):
            _FakeCheckpoint.unpersisted += 1

    evictions: list[int] = []

    def probe(spark, sf_dir):
        # memo state seen AT QUERY START: a prior query's entry must be gone
        evictions.append(len(dedup._PAIR_GRAPH_MEMO))
        dedup._PAIR_GRAPH_MEMO[("app", sf_dir)] = (_FakeCheckpoint(), frozenset())
        return _FakeDF(1)

    dedup._PAIR_GRAPH_MEMO.clear()
    try:
        run_benchmark(
            _CatalogSpark(), None, "sf", iterations=2, warmup=False,
            tiers=[("sql", {"p": probe})], clear_cache=True, warm_epoch=True,
        )
        # epoch + 2 interleaved + FLOOR_EXTRA floor runs, every one of them
        # starting with an EMPTY memo (the previous run's entry evicted)
        assert evictions == [0] * (3 + FLOOR_EXTRA), evictions
        assert not dedup._PAIR_GRAPH_MEMO
        # eviction released the checkpoint blocks, not just the dict entry
        assert _FakeCheckpoint.unpersisted == 3 + FLOOR_EXTRA
    finally:
        dedup._PAIR_GRAPH_MEMO.clear()


def test_bench_cli_flags_map_to_env(monkeypatch):
    """Reference CLI parity: each bench.py flag sets its env knob, explicit
    env always wins (flags use setdefault), and a bare invocation touches
    nothing — the grading driver's `python bench.py` stays canonical."""
    import importlib
    import os

    bench_mod = importlib.import_module("bench")
    for var in (
        "SPARK_GRAFT_BENCH_ITERATIONS",
        "SPARK_GRAFT_BENCH_ONLY",
        "SPARK_GRAFT_BENCH_MEM",
        "SPARK_GRAFT_BENCH_SORTED",
    ):
        monkeypatch.delenv(var, raising=False)
    bench_mod._parse_cli_into_env([])
    assert "SPARK_GRAFT_BENCH_ONLY" not in os.environ
    bench_mod._parse_cli_into_env(
        ["--iterations", "2", "--query", "q1,q6", "--mem-table"]
    )
    assert os.environ["SPARK_GRAFT_BENCH_ITERATIONS"] == "2"
    assert os.environ["SPARK_GRAFT_BENCH_ONLY"] == "q1,q6"
    assert os.environ["SPARK_GRAFT_BENCH_MEM"] == "1"
    monkeypatch.setenv("SPARK_GRAFT_BENCH_ITERATIONS", "9")
    bench_mod._parse_cli_into_env(["--iterations", "3"])
    assert os.environ["SPARK_GRAFT_BENCH_ITERATIONS"] == "9"  # env wins
    # 0 is a legitimate flag value, not an unset flag: 0 == False in
    # Python, so a membership test against (None, False) would drop it
    monkeypatch.delenv("SPARK_GRAFT_BENCH_ITERATIONS", raising=False)
    bench_mod._parse_cli_into_env(["--iterations", "0"])
    assert os.environ["SPARK_GRAFT_BENCH_ITERATIONS"] == "0"


def test_chunked_ms_lines_fit_and_round_trip():
    """Round-15 driver-visibility fix: the per-query map re-encoded as
    integer-ms detail lines — every line <= 1000 chars and independently
    parseable, the union of chunks reproduces the full map exactly
    (ms = round(1000 * s)), parts numbered 1..n in input order."""
    import json

    from datafusion_distributed_experiment_spark.bench import chunked_ms_lines

    import __spark_entry__ as entry_mod

    # the real surface's names (worst case for line length) with plausible
    # 2-decimal headline values, exactly as bench.py main builds per_query
    per_query = {
        name: round(0.1 + (i % 77) * 0.13, 2)
        for i, name in enumerate(entry_mod.queries())
    }
    lines = chunked_ms_lines(per_query)
    assert 2 <= len(lines) <= 4, f"expected a handful of chunks, got {len(lines)}"
    merged: dict[str, int] = {}
    for i, line in enumerate(lines):
        assert len(line) <= 1000, f"chunk {i + 1} is {len(line)} chars"
        obj = json.loads(line)
        assert obj["detail"] == "per_query_ms"
        assert obj["part"] == i + 1 and obj["of"] == len(lines)
        assert not (set(obj["queries"]) & set(merged)), "chunks must not overlap"
        merged.update(obj["queries"])
    assert merged == {n: int(round(s * 1000)) for n, s in per_query.items()}
    # order stability: concatenated chunk keys == input order
    keys: list[str] = []
    for line in lines:
        keys.extend(json.loads(line)["queries"])
    assert keys == list(per_query)
