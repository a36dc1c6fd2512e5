"""Content-defined chunking: the offset-independence property.

The whole point of CDC boundaries (vs fixed-width chunks) is that a shared
passage produces identical chunks regardless of WHERE it sits in each
document — so passage-level dedup works across different prefixes/suffixes.
Oracle equivalence is covered by the corpus differential test; this pins the
property itself on constructed documents.
"""

from __future__ import annotations

from datafusion_distributed_experiment_spark.operators.dedup import (
    CHUNK_DIV,
    chunk_overlap_frame,
)


def _words(seed: str, n: int) -> str:
    return " ".join(f"{seed}{i}" for i in range(n))


def test_shared_passage_detected_at_different_offsets(spark):
    passage = _words("shared", 200)  # ~12 expected chunks at CHUNK_DIV=16
    docs = spark.createDataFrame(
        [
            (0, passage),  # the passage alone
            (1, _words("prefix", 37) + " " + passage + " " + _words("suffix", 23)),
            (2, _words("unrelated", 240)),  # no overlap at all
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in chunk_overlap_frame(docs).collect()}
    # doc 1 embeds the passage at a different offset: its interior chunks
    # hash identically to doc 0's (only the passage's edge chunks, merged
    # with prefix/suffix tokens, may differ) -> substantial overlap
    assert rows[1]["n_shared"] >= rows[0]["n_chunks"] - 2 > 0, rows[1]
    assert rows[1]["overlap_ppm"] > 500_000, rows[1]
    # a genuinely-unrelated document shares nothing
    assert rows[2]["n_shared"] == 0 and rows[2]["overlap_ppm"] == 0, rows[2]
    # chunk count sanity: ~len/CHUNK_DIV boundaries on average
    assert 200 // (CHUNK_DIV * 4) <= rows[0]["n_chunks"] <= 200, rows[0]


def test_fixed_width_chunking_would_miss_this(spark):
    """Contrast control: fixed-width chunking of the SAME two documents
    shares (almost) nothing because the offset shift misaligns every
    boundary — the failure mode CDC exists to fix. Computed inline (split
    every CHUNK_DIV tokens) rather than via the operator, as documentation
    of WHY the operator uses content-defined boundaries."""
    from pyspark.sql import functions as F

    from datafusion_distributed_experiment_spark.functions.text import tokens

    passage = _words("shared", 200)
    docs = spark.createDataFrame(
        [(0, passage), (1, _words("prefix", 37) + " " + passage)],
        "doc_id long, text string",
    )
    fixed = docs.select(
        "doc_id",
        F.posexplode(tokens(F.col("text"))).alias("pos", "tok"),
    ).withColumn("chunk_id", F.expr(f"pos DIV {CHUNK_DIV}"))
    chunks = fixed.groupBy("doc_id", "chunk_id").agg(
        F.concat_ws(" ", F.array_sort(F.collect_list(F.struct("pos", "tok")))["tok"]).alias("c")
    )
    a = {r["c"] for r in chunks.filter("doc_id = 0").collect()}
    b = {r["c"] for r in chunks.filter("doc_id = 1").collect()}
    # 37-token prefix is not a multiple of CHUNK_DIV -> all grids misaligned
    assert len(a & b) == 0


# ---- property: Spark pipeline vs a pure-Python replica ------------------- #

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datafusion_distributed_experiment_spark.operators.dedup import MOD, SHINGLE_MULT

_PMOD, _PMULT = 1_000_000_007, 31  # functions.text poly_hash constants


def _py_poly(s: str) -> int:
    acc = 0
    for ch in s:
        acc = (acc * _PMULT + ord(ch)) % _PMOD
    return acc


def _py_chunk_overlap(docs: list[tuple[int, str]]) -> dict[int, tuple[int, int, int]]:
    per_doc: dict[int, list[int]] = {}
    for doc_id, text in docs:
        th = [_py_poly(t) for t in text.split(" ") if t]
        groups: list[list[int]] = []
        cur: list[int] = []
        for h in th:
            cur.append(h)
            if h % CHUNK_DIV == 0:  # boundary token closes its own chunk
                groups.append(cur)
                cur = []
        if cur:
            groups.append(cur)
        if groups:
            hashes = []
            for g in groups:
                acc = 0
                for h in g:
                    acc = (acc * SHINGLE_MULT + h) % MOD
                hashes.append(acc)
            per_doc[doc_id] = hashes
    first: dict[int, int] = {}
    for doc_id in sorted(per_doc):
        for h in per_doc[doc_id]:
            first.setdefault(h, doc_id)
    return {
        doc_id: (
            len(hashes),
            sum(1 for h in hashes if first[h] < doc_id),
            math.floor(
                1e6 * sum(1 for h in hashes if first[h] < doc_id) / max(len(hashes), 1)
            ),
        )
        for doc_id, hashes in per_doc.items()
    }


@settings(max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        # tiny alphabet with spaces -> short repeating tokens, so chunk
        # hashes genuinely collide across documents and the first-owner /
        # overlap logic is exercised, not just the zero-overlap path
        st.text(alphabet="ab c", max_size=60),
        min_size=1,
        max_size=8,
    )
)
def test_chunk_overlap_matches_python_replica(spark, texts):
    docs = list(enumerate(texts))
    frame = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_chunks"], r["n_shared"], r["overlap_ppm"])
        for r in chunk_overlap_frame(frame).collect()
    }
    assert got == _py_chunk_overlap(docs)
