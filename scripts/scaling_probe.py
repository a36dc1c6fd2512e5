#!/usr/bin/env python
"""Empirical scaling probe: run the algorithmically-interesting operators at
sf0.001 / sf0.01 / sf0.1 (10x data steps) and report wall-clock growth.

A bucketed/blocked operator should grow roughly linearly with input size
(growth factor ~= 10 per step, usually much less while fixed overheads
dominate); a pair-explosion bug shows up as a super-linear jump (>= ~30x on a
10x step once out of the overhead-dominated regime). This is evidence for the
scale-design claims in SURVEY.md section 2.E, not a benchmark — one warm
execution per (op, sf).

Usage: python scripts/scaling_probe.py [op ...]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

# The operators whose scaling is non-obvious (candidate-pair generation,
# iterative convergence, sketching, windows) — the ones a reviewer would ask
# "but does it blow up?" about.
PROBE_OPS = [
    "minhash_dedup_pairs",
    "simhash_dedup_pairs",
    "ngram_jaccard_pairs",
    "dedup_clusters",
    "dedup_incremental",
    "embedding_dedup",
    "ann_lsh",
    "ann_ivf",
    "events_asof",
    "events_range_join",
    "events_kmv_distinct",
    "user_sessions",
    "corpus_pipeline",
    "domain_resample",
    "dedup_clusters_star",
    "salted_events_enrich",
    # round-5 additions: window cascades, collected-sequence state, corpus
    # explode + broadcast-df join, iterative rank joins, bitmap build+probe
    "funnel",
    "event_sequences",
    "top_terms",
    "pagerank_nations",
    "bloom_semi_agg",
    # selection tier: K-way broadcast distance fan-out, banded prefix sum
    "kmeans_assign",
    "token_budget_select",
]


def main() -> int:
    import __spark_entry__ as entry_mod
    from datafusion_distributed_experiment_spark import build_session

    only = sys.argv[1:] or PROBE_OPS
    spark = build_session(app_name="scaling-probe")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()

    out: dict[str, dict] = {}
    for name in only:
        fn = queries[name]
        times, rows = [], []
        for sf_dir in SF_DIRS:
            fn(spark, sf_dir).collect()  # warm: listing, codegen, caches
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            rows.append(len(fn(spark, sf_dir).collect()))
            times.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        growth = [
            round(times[i + 1] / times[i], 2) if times[i] > 0 else None
            for i in range(len(times) - 1)
        ]
        out[name] = {"sec": times, "rows": rows, "growth_per_10x": growth}
        print(f"{name:22s} sec={times} rows={rows} growth/10x={growth}", flush=True)

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
