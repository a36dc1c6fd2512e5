"""Winnowing fingerprints: the frame-decomposition must equal the textbook
algorithm (rightmost minimum of every full window, union over windows), and
the paper's guarantee must hold — every window of WINNOW_W consecutive
k-grams contributes at least one fingerprint.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datafusion_distributed_experiment_spark.operators.dedup import (
    MOD,
    SHINGLE_MULT,
    WINNOW_K,
    WINNOW_W,
    winnow_frame,
)

_PMOD, _PMULT = 1_000_000_007, 31  # functions.text poly_hash constants


def _py_poly(s: str) -> int:
    acc = 0
    for ch in s:
        acc = (acc * _PMULT + ord(ch)) % _PMOD
    return acc


def _py_kgram_hashes(text: str) -> list[int]:
    th = [_py_poly(t) for t in text.split(" ") if t]
    out = []
    for i in range(len(th) - WINNOW_K + 1):
        acc = 0
        for h in th[i : i + WINNOW_K]:
            acc = (acc * SHINGLE_MULT + h) % MOD
        out.append(acc)
    return out


def _py_winnow(hashes: list[int]) -> set[int]:
    """The textbook algorithm: for every full window, the RIGHTMOST position
    holding the window minimum; union over windows."""
    chosen: set[int] = set()
    for a in range(len(hashes) - WINNOW_W + 1):
        window = hashes[a : a + WINNOW_W]
        m = min(window)
        chosen.add(a + max(i for i, h in enumerate(window) if h == m))
    return chosen


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        # tiny alphabet -> repeated tokens -> equal k-gram hashes, so the
        # rightmost-tie rule is genuinely exercised
        st.text(alphabet="ab c", max_size=80),
        min_size=1,
        max_size=5,
    )
)
def test_winnow_matches_textbook_algorithm(spark, texts):
    docs = list(enumerate(texts))
    frame = spark.createDataFrame(docs, "doc_id long, text string")
    got: dict[int, set[int]] = {}
    for r in winnow_frame(frame).collect():
        got.setdefault(r["doc_id"], set()).add(r["pos"])
        hs = _py_kgram_hashes(texts[r["doc_id"]])
        assert r["fp"] == hs[r["pos"]]
    expect = {
        doc_id: _py_winnow(_py_kgram_hashes(text))
        for doc_id, text in docs
        if len(_py_kgram_hashes(text)) >= WINNOW_W
    }
    expect = {k: v for k, v in expect.items() if v}
    assert got == expect


def test_every_full_window_is_covered(spark):
    """The winnowing guarantee on real corpus data: in every run of
    WINNOW_W consecutive k-gram positions of every document, at least one
    position is fingerprinted."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(50)
    )
    selected: dict[int, set[int]] = {}
    for r in winnow_frame(docs).collect():
        selected.setdefault(r["doc_id"], set()).add(r["pos"])
    lengths = {
        r["doc_id"]: len(_py_kgram_hashes(r["text"]))
        for r in docs.collect()
    }
    checked = 0
    for doc_id, n in lengths.items():
        sel = selected.get(doc_id, set())
        for a in range(n - WINNOW_W + 1):
            assert any(
                q in sel for q in range(a, a + WINNOW_W)
            ), f"doc {doc_id}: window at {a} has no fingerprint"
            checked += 1
    assert checked > 100  # the guarantee was actually exercised
