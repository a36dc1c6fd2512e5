"""Round-12 hardening: time/NULL latents in the event-analytics tier.

Three classes the cross-engine gate could not see on the NULL-free,
whole-millisecond, post-1970 synthetic data:

- NULL identity/value rows: Spark ranks NULLs FIRST in ascending windows,
  DuckDB LAST — one NULL row inside a window silently changed session
  counts / percentile ranks DIFFERENTLY per engine. Both spellings now
  exclude them, so appending NULL rows must change nothing.
- Pre-epoch timestamps: Spark ``DIV`` and DuckDB ``//`` both truncate
  toward zero, so "day 0" spanned two calendar days in BOTH spellings
  (the gate passed while both were wrong); the shared ``_fdiv`` floor
  form fixes both. Pinned by cross-engine agreement on pre-epoch data
  plus an explicit floor assertion.
- Malformed JSON payloads: Spark ``from_json`` returns NULL where bare
  ``json_extract``/``CAST`` RAISED on DuckDB — a crash-vs-answer
  divergence on exactly the rows events_json exists to absorb.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from .conftest import SF_DIR


def _base_events() -> pa.Table:
    return pq.read_table(f"{SF_DIR}/events.parquet")


def _with_rows(tmp_path, name: str, extra: list[pa.Table]) -> str:
    out = pa.concat_tables([_base_events(), *extra])
    d = tmp_path / name
    d.mkdir()
    pq.write_table(out, str(d / "events.parquet"))
    return str(d)


def _nulled(t: pa.Table, col: str, n: int = 3) -> pa.Table:
    head = t.slice(0, n)
    i = head.schema.get_field_index(col)
    return head.set_column(i, head.schema.field(i), pa.nulls(n, head.schema.field(i).type))


# (query name, columns whose NULLs the operator must EXCLUDE)
_NULL_INVARIANT = [
    ("retention", ["ts"]),
    ("events_pivot", ["ts"]),
    ("events_unpivot", ["ts"]),
    ("anomaly_days", ["ts"]),
    ("events_percentiles", ["value"]),
    ("events_percentiles_hist", ["value"]),
    ("funnel", ["ts", "event_id"]),
    ("event_sequences", ["ts", "event_id"]),
    ("sessionize_native", ["ts"]),
    ("sessionize", ["ts"]),
    ("user_sessions", ["ts"]),
    ("rollup_incremental", ["ts"]),
]


@pytest.mark.parametrize("name,cols", _NULL_INVARIANT, ids=[n for n, _ in _NULL_INVARIANT])
def test_null_rows_are_excluded_identically(name, cols, spark, tmp_path):
    """Appending rows that are NULL in exactly the columns the operator
    keys/orders/values on must change NOTHING — and the (fixed) DuckDB
    oracle must agree with the (fixed) Spark side on the SAME adversarial
    parquet, where the old pair diverged or agreed on being wrong."""
    import __spark_entry__ as entry_mod

    t = _base_events()
    nulls_dir = _with_rows(tmp_path, "nulls", [_nulled(t, c) for c in cols])
    q = entry_mod.queries()[name]
    got = [tuple(r) for r in q(spark, nulls_dir).collect()]
    clean = [tuple(r) for r in q(spark, SF_DIR).collect()]
    assert got == clean, f"{name}: NULL rows must be excluded"
    oracle = entry_mod.oracle_sql()[name]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{nulls_dir}/events.parquet'")
    # some oracles also read dimension tables
    for tab in ("customer", "lineitem", "documents"):
        con.execute(f"CREATE VIEW {tab} AS SELECT * FROM '{SF_DIR}/{tab}.parquet'")
    odf = con.execute(oracle).df()
    assert sorted(map(tuple, odf.itertuples(index=False))) == sorted(got), (
        f"{name}: oracle disagrees on the NULL-bearing corpus"
    )


def _pre_epoch_rows(t: pa.Table, n: int = 4) -> pa.Table:
    """Rows at 1969-12-31T12:00Z (epoch-day -1 under FLOOR, day 0 under the
    old truncation) with fresh unique event_ids."""
    import datetime

    head = t.slice(0, n)
    ts_i = head.schema.get_field_index("ts")
    ts_type = head.schema.field(ts_i).type
    stamp = datetime.datetime(1969, 12, 31, 12, 0, 0)
    head = head.set_column(
        ts_i, head.schema.field(ts_i), pa.array([stamp] * n, type=ts_type)
    )
    id_i = head.schema.get_field_index("event_id")
    id_type = head.schema.field(id_i).type
    head = head.set_column(
        id_i,
        head.schema.field(id_i),
        pa.array([10_000_000 + j for j in range(n)], type=id_type),
    )
    return head


@pytest.mark.parametrize(
    "name", ["retention", "events_pivot", "events_unpivot", "anomaly_days"]
)
def test_pre_epoch_days_floor_identically(name, spark, tmp_path):
    """Events at 1969-12-31T12:00Z must land on epoch-day -1, NOT be merged
    into day 0 alongside 1970-01-01 events (the shared truncate-toward-zero
    defect lived in BOTH spellings, so only a pre-epoch fixture plus an
    explicit floor assertion can pin it)."""
    import __spark_entry__ as entry_mod

    d = _with_rows(tmp_path, "preepoch", [_pre_epoch_rows(_base_events())])
    q = entry_mod.queries()[name]
    got = [tuple(r) for r in q(spark, d).collect()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    odf = con.execute(entry_mod.oracle_sql()[name]).df()
    assert sorted(map(tuple, odf.itertuples(index=False))) == sorted(got), (
        f"{name}: cross-engine mismatch on pre-epoch data"
    )
    if name == "events_pivot":
        days = {r[0] for r in got}
        assert -1 in days, f"pre-epoch events must floor to day -1, days={days}"
        # and they must NOT have been merged into day 0's counts: day -1
        # carries exactly the 4 appended rows
        row = {r[0]: r for r in got}[-1]
        assert sum(row[1:]) == 4


def test_anomaly_headroom_guard():
    """Overflow-guard family contract for the squared z-test (round-12
    review: n*q and dev^2 wrap silently on Spark with ANSI off while
    DuckDB's HUGEINT window sums stay exact — and the old docstring's
    'safe' 1e6/day x 1e4 days already overflowed): pure, trips at the
    bound."""
    import math

    from datafusion_distributed_experiment_spark.errors import PlanningError
    from datafusion_distributed_experiment_spark.operators.analytics import (
        check_anomaly_headroom,
    )

    bound = math.isqrt((2**63 - 1) // 4)
    check_anomaly_headroom(0, 0)
    check_anomaly_headroom(1, bound)
    with pytest.raises(PlanningError, match="anomaly z-test"):
        check_anomaly_headroom(1, bound + 1)
    with pytest.raises(PlanningError, match="anomaly z-test"):
        check_anomaly_headroom(10_000, 1_000_000)  # the old docstring's claim


def test_events_json_absorbs_malformed_payloads(spark, tmp_path):
    """events_json exists to COUNT malformed payloads, but the old oracle
    RAISED on the first one (bare json_extract/CAST) while Spark's
    from_json returned NULL — crash-vs-answer. The json_valid +
    json_type-gated TRY_CAST oracle must now agree with Spark on every
    payload shape from_json NULLs out (malformed, string-encoded number,
    float, boolean, overflow)."""
    import __spark_entry__ as entry_mod

    t = _base_events()
    head = t.slice(0, 6)
    i = head.schema.get_field_index("props")
    payloads = [
        "not json",
        '{"k": "42"}',
        '{"k": 1.5}',
        '{"k": true}',
        '{"k": 123456789012345678901234}',
        '{"k": 7}',
    ]
    head = head.set_column(
        i, head.schema.field(i), pa.array(payloads, type=head.schema.field(i).type)
    )
    d = _with_rows(tmp_path, "badjson", [head])
    got = [tuple(r) for r in entry_mod.queries()["events_json"](spark, d).collect()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    odf = con.execute(entry_mod.oracle_sql()["events_json"]).df()

    def canon(rows):
        # NULL k_decile sorts; pandas surfaces NULL BIGINT as NaN-float
        return sorted(
            (tuple("NULL" if x != x or x is None else str(int(x)) if isinstance(x, float) else str(x) for x in r))
            for r in rows
        )

    assert canon(map(tuple, odf.itertuples(index=False))) == canon(got)


def test_stream_click_attr_sub_millisecond_boundary(spark, tmp_path):
    """The interval join must evaluate at MILLISECOND precision like its
    oracle: a click/view pair whose microsecond parts straddle the
    10-minute boundary flipped between engines before the ms-truncate fix
    (Spark compared raw microseconds; the oracle compared ms-truncated
    ts_ms)."""
    import datetime

    import __spark_entry__ as entry_mod

    t = _base_events()
    head = t.slice(0, 2)
    ts_i = head.schema.get_field_index("ts")
    ts_type = head.schema.field(ts_i).type
    base = datetime.datetime(2024, 6, 1, 0, 0, 0)
    # view at +499us; click at +10min +999us: ms-truncated the pair is
    # EXACTLY on the boundary (inclusive -> joins); at us precision the
    # view falls 500us before the window
    stamps = [base + datetime.timedelta(microseconds=499),
              base + datetime.timedelta(minutes=10, microseconds=999)]
    head = head.set_column(ts_i, head.schema.field(ts_i), pa.array(stamps, type=ts_type))
    for col, vals in (
        ("event_type", ["view", "click"]),
        ("user_id", [777_001, 777_001]),
        ("event_id", [20_000_001, 20_000_002]),
    ):
        i = head.schema.get_field_index(col)
        head = head.set_column(
            i, head.schema.field(i), pa.array(vals, type=head.schema.field(i).type)
        )
    d = _with_rows(tmp_path, "subms", [head])
    got = [tuple(r) for r in entry_mod.queries()["stream_click_attr"](spark, d).collect()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    odf = con.execute(entry_mod.oracle_sql()["stream_click_attr"]).df()
    assert sorted(map(tuple, odf.itertuples(index=False))) == sorted(got)
    # the boundary pair itself must be present (inclusive at ms precision)
    assert any(r[0] == 20_000_002 and r[3] == 20_000_001 for r in got), got


def test_text_counters_agree_cross_engine_on_mixed_case(spark, tmp_path):
    """Round-12 review fixes for the text tier, pinned cross-engine on a
    constructed mixed-case/Unicode corpus: (a) stopword counting matches
    case-insensitively (capitalized 'The'/'In'/'A' previously counted 0 in
    BOTH spellings); (b) the BPE/word-run counters run case-explicit
    patterns over the RAW text — the old lower(text) pre-pass diverged
    between engines on special-cased characters (JVM lower('İ') is two
    codepoints, utf8proc's one); (c) round-13 review: STOPWORD matching
    itself folds via the engine-neutral ASCII translate, not lower() —
    the token 'İN' lowers to 'i̇n' on the JVM (no stopword match) but
    'in' under utf8proc's simple mapping (match), so doc 5 diverged
    cross-engine under the lower() spelling; under ascii_lower both
    engines agree it is NOT a stopword (the fold only touches [A-Z]),
    while plain-caps 'IN'/'IS' still count."""
    import __spark_entry__ as entry_mod

    rows = [
        (1, "web", "The cat sat. The dog ran. In a field."),
        (2, "web", "IT'S A TEST OF THE SYSTEM"),
        (3, "web", "İstanbul naïve café 123"),
        (4, "web", "plain lowercase words and the usual text"),
        (5, "web", "İN IS THE crowd İstanbul"),
    ]
    d = tmp_path / "mixedcase"
    d.mkdir()
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    for name in ("text_stats", "token_count", "lang_id", "quality_score"):
        got = sorted(
            tuple(r) for r in entry_mod.queries()[name](spark, str(d)).collect()
        )
        odf = con.execute(entry_mod.oracle_sql()[name]).df()
        assert sorted(map(tuple, odf.itertuples(index=False))) == got, name
    # the capitalized-stopword doc must now show nonzero stopword density
    stats = {
        r["doc_id"]: r
        for r in entry_mod.queries()["text_stats"](spark, str(d)).collect()
    }
    assert stats[1]["stopword_ppm"] > 0, "capitalized stopwords must count"
    assert stats[2]["stopword_ppm"] > 0, "'A'/'OF'/'THE' in caps must count"
    # doc 5: 'IS'+'THE' count (2 of 5 tokens = 400000 ppm); 'İN' must NOT
    # — the ASCII fold leaves 'İ' alone on BOTH engines, where lower()
    # made the engines disagree (Spark 'i̇n' vs DuckDB 'in')
    assert stats[5]["stopword_ppm"] == 400_000, (
        f"ascii_lower stopword fold drifted: {stats[5]['stopword_ppm']}"
    )


def test_poly_hash_and_char_split_codepoint_parity(spark, tmp_path):
    """Round-12 review fix: the char split behind poly_hash (and BPE's
    position table) must be CODEPOINT-wise like DuckDB's string_split('') —
    Java's split("(?!$)") broke surrogate pairs into two lone surrogates,
    so every hash-verified dedup/BPE operator diverged on the first astral
    character. Pinned cross-engine on a constructed corpus with emoji,
    accents, and special-cased characters."""
    import __spark_entry__ as entry_mod

    rows = [
        (1, "web", "hello world plain text"),
        (2, "web", "emoji 😀 in the middle and end 😀"),
        (3, "web", "héllo naïve İstanbul"),
        (4, "web", "a😀b😀 tokens with pairs"),
    ]
    d = tmp_path / "astral"
    d.mkdir()
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    for name in ("minhash_signatures", "fingerprint", "winnow_fingerprints",
                 "bpe_merges_t2", "simhash_signatures"):
        got = sorted(
            tuple(r) for r in entry_mod.queries()[name](spark, str(d)).collect()
        )
        odf = con.execute(entry_mod.oracle_sql()[name]).df()
        assert sorted(map(tuple, odf.itertuples(index=False))) == got, name


def test_dedup_excludes_null_text_and_negative_odd_ids(spark, tmp_path):
    """Round-12 review fixes pinned together on one constructed corpus:
    (a) NULL-text docs are excluded from the dedup corpus on both engines
    (Spark propagated all-NULL signatures while the oracle's
    list_prepend(0, NULL) fabricated a REAL signature); (b) the
    incremental split uses % 2 != 0, so a NEGATIVE odd doc_id lands in
    the incoming batch instead of silently vanishing from both sides."""
    import __spark_entry__ as entry_mod

    rows = [
        (-3, "web", "negative odd doc must be dedup checked not dropped"),
        (-2, "web", "negative even doc joins the index side"),
        (1, "web", "an ordinary odd document body"),
        (2, "web", None),
        (4, "web", "an ordinary even document body"),
    ]
    d = tmp_path / "dedupnulls"
    d.mkdir()
    spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
    )
    for name in ("minhash_signatures", "dedup_incremental"):
        got = sorted(
            tuple(r) for r in entry_mod.queries()[name](spark, str(d)).collect()
        )
        odf = con.execute(entry_mod.oracle_sql()[name]).df()
        assert sorted(map(tuple, odf.itertuples(index=False))) == got, name
    # the NULL-text doc is absent; the negative odd doc is present
    sig_ids = {r[0] for r in entry_mod.queries()["minhash_signatures"](spark, str(d)).collect()}
    assert 2 not in sig_ids and -3 in sig_ids
    inc_ids = {
        r["doc_id"]
        for r in entry_mod.queries()["dedup_incremental"](spark, str(d)).collect()
    }
    assert -3 in inc_ids, "negative odd docs must reach the incoming batch"


@pytest.mark.parametrize(
    "name", ["events_rolling", "events_window_funcs", "events_latest", "events_topk"]
)
def test_shared_sql_window_order_is_null_explicit(name, spark, tmp_path):
    """Round-13 review: the shared-SQL corpus runs ONE text on both
    engines, so the oracle is blind to everything except ENGINE-SEMANTIC
    differences — and window ORDER BY is one: Spark defaults ASC to NULLS
    FIRST where DuckDB defaults to NULLS LAST, so a NULL ts silently
    reordered window frames between engines (events_rolling and
    events_window_funcs hash-diverged; events_latest only matched because
    the DESC defaults happen to coincide). NULLS FIRST/LAST is now
    explicit in every nullable window ordering; pinned on NULL-poisoned
    events."""
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as entry_mod

    src = "/root/testdata/sf0.001"
    d = tmp_path / "nullevents"
    d.mkdir()
    for t in ("events",):
        shutil.copy(f"{src}/{t}.parquet", f"{d}/{t}.parquet")
    tbl = pq.read_table(f"{d}/events.parquet")

    def null_some(t, col, idx):
        i = t.schema.get_field_index(col)
        arr = t.column(i).to_pylist()
        for j in idx:
            arr[j] = None
        return t.set_column(i, t.schema.field(i), pa.array(arr, t.schema.field(i).type))

    from ._compare import assert_frames_match

    tbl = null_some(tbl, "ts", [0, 1, 2, 7, 8])
    tbl = null_some(tbl, "user_id", [3, 4])
    tbl = null_some(tbl, "value", [5, 6])
    pq.write_table(tbl, f"{d}/events.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    sdf = entry_mod.queries()[name](spark, str(d)).toPandas()
    assert len(sdf) > 0
    odf = con.execute(entry_mod.oracle_sql()[name]).df()
    assert_frames_match(sdf, odf, name)


@pytest.mark.parametrize("name", ["stream_sliding", "stream_topk"])
def test_streaming_window_oracles_drop_null_event_time(name, spark, tmp_path):
    """Round-13 review: Spark's streaming F.window DROPS rows whose
    event-time is NULL (there is no window to assign), but the two
    closed-form window oracles kept them — a NULL-ts row materialized a
    NaT window / NULL day group on the DuckDB side only. Both oracles now
    filter ts IS NOT NULL; pinned on NULL-poisoned events (ts AND
    event_type, so the NULL-type group path is exercised too — NULL type
    with a REAL timestamp is a legitimate group both engines keep)."""
    import __spark_entry__ as entry_mod

    from ._compare import assert_frames_match

    t = _base_events()
    d = _with_rows(
        tmp_path, "nullstream", [_nulled(t, "ts"), _nulled(t, "event_type")]
    )
    sdf = entry_mod.queries()[name](spark, d).toPandas()
    assert len(sdf) > 0
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
    odf = con.execute(entry_mod.oracle_sql()[name]).df()
    assert_frames_match(sdf, odf, name)
