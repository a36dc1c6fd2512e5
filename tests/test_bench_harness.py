"""Unit tests for the bench harness logic (no JVM): interleaved pass order,
failure isolation, min/spread estimators, and measure-last tier ordering."""

from __future__ import annotations

from datafusion_distributed_experiment_spark.bench import (
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
    # pass 1 of every query precedes pass 2 of any; streaming at each pass end
    assert log == ["a", "b", "s1", "a", "b", "s1"], log
    assert all(len(e["iterations"]) == 2 for e in results["queries"])
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
    # neighbors unaffected, all passes measured
    assert len(by_name["ok"]["iterations"]) == 3
    assert len(by_name["after"]["iterations"]) == 3


def test_min_estimator_and_spread():
    entry = {"iterations": [{"elapsed_ms": v} for v in (1058.0, 11500.0, 10329.0, 800.0, 770.0)]}
    assert mean_seconds(entry) == 0.77  # min recovers the uncontaminated cost
    assert spread_ratio(entry) == round(11500.0 / 770.0, 2)
    assert mean_seconds({"iterations": []}) is None
    assert spread_ratio({"iterations": [{"elapsed_ms": 5.0}]}) is None
