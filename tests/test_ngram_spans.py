"""Exact-substring span dedup: semantics on constructed documents plus a
pure-Python differential property.

Oracle equivalence over the real corpus is covered by the driver gate /
verify_correctness; these pin the SPAN semantics themselves — maximality,
merging, the cross-document (not within-document) duplicate test — on
documents built to exercise each edge.
"""

from __future__ import annotations

from datafusion_distributed_experiment_spark.operators.dedup import (
    MOD,
    SHINGLE_MULT,
    SPAN_K,
    ngram_span_frame,
)


def _words(seed: str, n: int) -> str:
    return " ".join(f"{seed}{i}" for i in range(n))


def test_shared_run_becomes_one_maximal_span(spark):
    passage = _words("shared", 30)  # 30 tokens -> positions 0..22 duplicated
    docs = spark.createDataFrame(
        [
            (0, passage),
            (1, _words("pre", 10) + " " + passage + " " + _words("post", 5)),
            (2, _words("unrelated", 40)),
        ],
        "doc_id long, text string",
    )
    rows = ngram_span_frame(docs).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 0: the whole document is duplicated -> ONE span covering it all
    (s0,) = by_doc[0]
    assert (s0["span_start"], s0["span_end"]) == (0, 29)
    assert s0["n_dup_ngrams"] == 30 - SPAN_K + 1
    # doc 1: the duplicated region is exactly the embedded passage (the
    # boundary n-grams straddling prefix/passage exist only in doc 1)
    (s1,) = by_doc[1]
    assert (s1["span_start"], s1["span_end"]) == (10, 39)
    # doc 2: nothing shared -> no span rows at all
    assert 2 not in by_doc


def test_within_document_repeat_is_not_cross_document(spark):
    """A phrase repeated twice inside ONE document is not a cross-document
    duplicate — min(doc)=max(doc) must suppress it (countDistinct-free)."""
    phrase = _words("p", SPAN_K)
    docs = spark.createDataFrame(
        [(7, phrase + " " + _words("mid", 12) + " " + phrase)],
        "doc_id long, text string",
    )
    assert ngram_span_frame(docs).count() == 0


def test_adjacent_spans_merge_and_distant_do_not(spark):
    """Two duplicated phrases in one doc: separated by a gap > SPAN_K they
    stay two spans; the shared phrases themselves are maximal."""
    a, b = _words("aa", 12), _words("bb", 12)
    docs = spark.createDataFrame(
        [
            (0, a + " " + _words("gapx", 20) + " " + b),
            (1, a),
            (2, b),
        ],
        "doc_id long, text string",
    )
    spans = sorted(
        (r["span_start"], r["span_end"])
        for r in ngram_span_frame(docs).filter("doc_id = 0").collect()
    )
    assert spans == [(0, 11), (32, 43)]


# ---- property: Spark pipeline vs a pure-Python replica ------------------- #

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_PMOD, _PMULT = 1_000_000_007, 31  # functions.text poly_hash constants


def _py_poly(s: str) -> int:
    acc = 0
    for ch in s:
        acc = (acc * _PMULT + ord(ch)) % _PMOD
    return acc


def _py_spans(docs: list[tuple[int, str]]) -> set[tuple[int, int, int, int]]:
    pos: list[tuple[int, int, int]] = []  # (doc_id, pos, gh)
    for doc_id, text in docs:
        th = [_py_poly(t) for t in text.split(" ") if t]
        for i in range(len(th) - SPAN_K + 1):
            acc = 0
            for h in th[i : i + SPAN_K]:
                acc = (acc * SHINGLE_MULT + h) % MOD
            pos.append((doc_id, i, acc))
    owners: dict[int, set[int]] = {}
    for doc_id, _, gh in pos:
        owners.setdefault(gh, set()).add(doc_id)
    hits: dict[int, list[int]] = {}
    for doc_id, i, gh in pos:
        if len(owners[gh]) > 1:
            hits.setdefault(doc_id, []).append(i)
    out: set[tuple[int, int, int, int]] = set()
    for doc_id, ps in hits.items():
        ps.sort()
        start, prev, n = ps[0], ps[0], 1
        for p in ps[1:]:
            if p - prev > SPAN_K:
                out.add((doc_id, start, prev + SPAN_K - 1, n))
                start, n = p, 0
            prev = p
            n += 1
        out.add((doc_id, start, prev + SPAN_K - 1, n))
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        # tiny alphabet -> heavy token repetition, so cross-document n-gram
        # collisions actually occur and the merge logic is exercised
        st.text(alphabet="ab c", max_size=80),
        min_size=1,
        max_size=6,
    )
)
def test_ngram_spans_match_python_replica(spark, texts):
    docs = list(enumerate(texts))
    frame = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_dup_ngrams"])
        for r in ngram_span_frame(frame).collect()
    }
    assert got == _py_spans(docs)


# ---- span_scrub: the apply step ------------------------------------------ #

from datafusion_distributed_experiment_spark.operators.dedup import span_scrub_frame


def test_scrub_keeps_first_copy_and_empties_later_copies(spark):
    passage = _words("shared", 30)
    docs = spark.createDataFrame(
        [
            (0, passage),
            (1, passage),  # exact duplicate: must lose every token
            (2, _words("pre", 10) + " " + passage),  # loses exactly the passage
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in span_scrub_frame(docs).collect()}
    assert rows[0]["n_dropped"] == 0  # first occurrence survives whole
    assert rows[1]["n_dropped"] == 30 and rows[1]["scrubbed_fp"] == 0
    # doc 2: the embedded passage goes, the unique prefix stays
    assert rows[2]["n_dropped"] == 30
    assert rows[2]["n_tokens"] == 40
    # kept prefix of doc 2 == doc "pre only" fingerprint
    pre_only = {r["doc_id"]: r for r in span_scrub_frame(
        spark.createDataFrame([(9, _words("pre", 10))], "doc_id long, text string")
    ).collect()}
    assert rows[2]["scrubbed_fp"] == pre_only[9]["scrubbed_fp"]


def _py_scrub(docs: list[tuple[int, str]]) -> dict[int, tuple[int, int, int]]:
    token_hashes = {d: [_py_poly(t) for t in s.split(" ") if t] for d, s in docs}
    grams: dict[int, list[tuple[int, int]]] = {}
    first: dict[int, int] = {}
    for d in sorted(token_hashes):
        th = token_hashes[d]
        for i in range(len(th) - SPAN_K + 1):
            acc = 0
            for h in th[i : i + SPAN_K]:
                acc = (acc * SHINGLE_MULT + h) % MOD
            grams.setdefault(d, []).append((i, acc))
            first.setdefault(acc, d)
    out = {}
    for d, th in token_hashes.items():
        if not th:
            continue
        drop: set[int] = set()
        for i, gh in grams.get(d, []):
            if first[gh] < d:
                drop.update(range(i, i + SPAN_K))
        acc = 0
        for t, h in enumerate(th):
            if t not in drop:
                acc = (acc * SHINGLE_MULT + h) % MOD
        out[d] = (len(th), len(drop), acc)
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.text(alphabet="ab c", max_size=80),
        min_size=1,
        max_size=6,
    )
)
def test_span_scrub_matches_python_replica(spark, texts):
    docs = list(enumerate(texts))
    frame = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_dropped"], r["scrubbed_fp"])
        for r in span_scrub_frame(frame).collect()
    }
    assert got == _py_scrub(docs)
