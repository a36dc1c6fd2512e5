#!/usr/bin/env python
"""Regenerate PLANS.md: scrubbed physical plans for the headline operators.

The committed artifact lets a reviewer audit the plan-level scale claims
(pushdown reaching the scan, partial/final aggregate splits, broadcast
sides, single shared exchanges, map-only probes) without running Spark —
the same role the reference's committed insta plan snapshots play
(reference ``tests/distributed_aggregation.rs:32-62``).

Usage: python scripts/dump_plans.py   # rewrites PLANS.md at the repo root
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"

# (name, why this plan is worth auditing)
SHOWCASE = [
    ("q3", "TPC-H join+agg+topk: broadcast dims, partial/final agg, TakeOrdered"),
    ("q6", "pushdown: every predicate reaches the parquet scan"),
    ("funnel", "cascaded windows + per-user agg on ONE hash exchange"),
    ("events_percentiles", "rank-selection aggregate reuses the window partitioning"),
    ("minhash_signatures", "map-only signature fold: zero exchanges before output"),
    ("dedup_incremental", "index side never shuffles; incoming bands broadcast"),
    ("bloom_semi_agg", "map-side bitmap probe before the join shuffle"),
    ("top_terms", "vocabulary-size df broadcast; checkpointed tf, single corpus scan"),
    ("pagerank_nations", "fact tables collapse to |V|^2 edges before iterating"),
    ("rollup_incremental", "raw-ts delta filter pushed to the scan"),
    ("events_cube", "all grouping sets in one Expand + partial/final aggregate"),
    ("sessionize_native", "native session_window merging aggregate"),
    ("kmeans_assign", "ONE broadcast centroid row; argmin is a map-only projection"),
    ("token_budget_select", "banded prefix sum: corpus window partitioned by band, single-partition frame only for the O(bands) offset table"),
    ("minhash_pairs_skew", "skew guard live: broadcast anti-join suppresses hub buckets BEFORE the band self-join shuffle"),
    ("semantic_dedup", "IVF-clustered pairwise cosine: checkpointed index, equi-join on the cluster key (never cartesian), hub clusters capped"),
    ("chunk_overlap", "CDC chunking: one doc_id exchange shared by boundary window + chunk fold; checkpointed chunk table; vocabulary-sized owners broadcast"),
    ("ngram_span_dedup", "exact-substring spans: checkpointed position table feeds owner aggregate + join-back; gaps-and-islands per doc_id, no single-partition funnel"),
    ("bm25_topk", "inverted-index scoring: query terms / df / corpus stats ALL broadcast onto the checkpointed postings slice; 3 corpus scans total"),
    ("dsir_weights", "feature-hash importance weights: ONE conditional-sum count pass, NBUCK-row weight table broadcast back onto the checkpointed bigram stream"),
    ("triangle_count", "degree-ordered orientation: wedge join + closing probe all read the checkpointed oriented-edge RDD; fact joins never re-run"),
    ("bpe_merges_t2", "BPE training: corpus scanned exactly twice (dictionary + application); merge rounds on checkpointed vocabulary-sized tables; 1-row top pair broadcast"),
    ("winnow_fingerprints", "winnowing selection: all 2(W-1) min-frames share ONE (doc_id, pos) exchange; zero joins, zero per-window row explosion"),
    ("cms_heavy_hitters", "count-min build: D*W-cell bounded aggregate (map-side partial sketches merge cell-wise); finished sketch broadcasts onto the probes"),
    ("span_scrub", "scrub apply step: checkpointed position table, MIN-owner aggregate; only DROPPED positions shuffle (per-doc collect_set), fingerprint folds array_except of kept positions map-side — the token stream never re-explodes"),
    ("lpa_communities_t3", "label propagation: checkpointed |E|-row bidirected edges reused every round; per round one join + aggregate + per-node top-1 window"),
    ("bfs_hops_t3", "multi-source BFS: min-plus frontier relaxation as one join + min-aggregate per round on the checkpointed edge list"),
    ("bpe_apply", "tokenizer encode: trained model broadcasts three ways (word->n_toks, word->tokens, token->id, all vocab-sized); ONE corpus scan; only corpus-wide exchange is the per-doc prefix sum over WORD rows — token fan-out is map-side after it"),
    ("hll_distinct", "HLL build: per-key register MAX merges map-side; integer estimator is a pure projection; exact twin rides the same key exchange"),
    ("weighted_sample", "priority sampling: map-only integer priorities, TakeOrderedAndProject top-k (per-partition heaps, no global sort); rank window bounded by k rows"),
    ("corpus_pipeline", "flagship composition: quality+token features fused into the scan of EACH augmented-corpus union branch (2 documents scans total, filters pushed); AQE resolves the pairs-sized drop set to ONE BroadcastHashJoin LeftAnti whose exchange is built once and ReusedExchange'd by the other branch; map-side partial aggregate feeds the 1-row rollup"),
    ("dedup_clusters", "cluster resolution (label-prop CC): ALL iterative work ran during construction on pairs-sized checkpointed state (graph-width-scoped shuffles, per-round localCheckpoint) — the returned plan is a checkpointed-RDD scan plus the range-partitioned presentation sort: zero parquet scans, zero joins, zero corpus-sized exchanges"),
    ("dedup_clusters_star", "cluster resolution (large/small-star CC): returned plan joins the nodes table to the fixpoint star edges — two checkpointed-RDD scans, pairs-sized hash exchanges (SMJ is the scale-safe choice: the dup-node side needn't fit a broadcast), zero parquet scans"),
    ("minhash_dedup_pairs", "LSH mine: checkpointed signatures feed ALL five consumers (cap count, both band self-join sides, both token join-backs — zero parquet scans); hub buckets suppressed by a broadcast LEFT ANTI before the band shuffle"),
    ("simhash_dedup_pairs", "byte-band SimHash LSH: ONE exploded band table self-joined on the (band_idx, byte) equi-key — not four per-byte joins; Hamming verify is a map-side filter over the checkpointed signature table"),
    ("ngram_jaccard_pairs", "blocking-key Jaccard: tokenize ONCE into the checkpoint; candidates from the (first-token, length-band) equi-join, exact verify on the pair rows — never a cartesian"),
    ("kmeans_lloyd_t3", "Lloyd k-means final assignment: pure projection over the checkpointed quantized vectors against LITERAL centroids — zero joins/aggregates/parquet; per-round M-steps collected only K x DIM sums during construction"),
    ("ann_ivf", "IVF top-k: map-only list assignment against literal centroids; the ONLY shuffle is the probe join keyed by list_id (candidates ~ sqrt(N) per query), then a per-query rank window"),
    ("media_resize", "multimodal resize: ONE parquet scan into ONE Arrow-batched MapInPandas stage (the single sanctioned Python boundary); digest/metadata projection stays JVM-side above it"),
    ("basket_pairs", "market-basket mining: exactly two shuffles (basket collapse, pair support) with the k^2 pair explode map-side from basket arrays; top-N is TakeOrderedAndProject heaps, no global sort"),
    ("domain_resample", "temperature resampling: per-source weight table broadcast onto ONE corpus scan; copy counts are a map-only hash decision — no corpus shuffle beyond the weight aggregation itself"),
    ("repetition_stats", "Gopher repetition signals: 2-gram explode absorbed by a map-side partial count, shuffle carries one row per DISTINCT gram per doc; doc rollup is a second doc-row-sized exchange"),
    ("domain_token_profile", "sharded-HLL profile (promoted r10): corpus-fanout sketch build runs once into the checkpointed profile; returned plan is profile-sized (two RDD reads + 1-row totals broadcast, zero parquet)"),
    ("media_features", "multimodal feature extraction: ONE scan into ONE Arrow-batched MapInPandas (the single Python boundary crossing); metadata projection and sort stay JVM-side"),
    ("custom_source_scan", "Python DataSource extension leaf: plans as a DSv2 BatchScan feeding ordinary Catalyst operators — the user-codec custom-leaf analog (reference tests/custom_extension_codec.rs)"),
    ("dedup_exact", "exact dedup: ONE digest hash exchange with partial/final aggregate split (identical texts combine map-side); no rebalance (the groupBy is the fan-out), no joins"),
    ("events_asof", "as-of join: union + ONE window pass (last(payload) ignorenulls) over the key exchange — ZERO join operators; the theta-join spelling would plan a per-key-quadratic BroadcastNestedLoopJoin"),
    ("events_range_join", "interval range join: interval side explodes over covered time buckets, probe joins on the (key, bucket) EQUI-key, containment is a post-join filter — never a nested-loop inequality join"),
    ("user_sessions", "sessionization: all gap/session windows share ONE user_id exchange (plan-tested); per-task state is one user's events"),
    ("table_profile", "one-pass profiling: N count(distinct) aggregates through ONE Expand inside a single partial/final aggregate pass — never a per-column rescan; batching caps the Expand factor past 16 columns"),
    ("events_percentiles_hist", "histogram-sketch percentiles: bin counts are a bounded partial/final aggregate (state O(bins) per group at any group size); domain stats broadcast twice; cum-sum window runs on the BINS*types table, never the fact rows"),
    ("stream_topk", "streaming top-k split: the STATEFUL micro-batch plan (below, captured from the executed drain) is partial agg -> ONE REQUIRED_BY_STATEFUL_OPERATOR exchange -> StateStoreRestore/Save; rank is a batch window over the windows*types memory sink, zero parquet"),
    ("ivf_pq_topk", "IVF-PQ+refine ANN (promoted r12) (Jegou et al. ADC + FAISS-style exact rerank): codebook/centroids are literal model state, encode+assign is ONE map-only projection (zero pre-join exchanges), the (query x probe x LUT) side BROADCASTS so the corpus never shuffles (BuildLeft BHJ over PQ_M-byte codes); the shortlist then broadcasts back onto a second map-side corpus pass for the exact integer-cosine re-score — the only hash exchanges are the two partial/final WindowGroupLimit top-k's over candidate rows"),
    ("ivf_pq_index_build", "IVF-PQ index build/serve split (promoted r13) (FAISS on-disk IndexIVFPQ lifecycle): the encode corpus pass is persisted ONCE as a parquet table BUCKETED on list_id (the probe shuffle paid at write time); the serve half's probed-list IN-filter prunes whole buckets at plan time (SelectedBucketsCount in the ONLY FileScan of the returned plan — at scale a query batch reads a vanishing fraction of the index bytes) and the ADC/shortlist/refine pipeline is the shared _pq_serve kernel, bit-identical to ivf_pq_topk"),
    ("minhash_index_upsert", "staged (r14) persisted MinHash LSH band-index maintenance (signatures -> pairs -> clusters -> incremental -> MAINTAINED index, the dedup-lifecycle completion): the CDC delta's band rows come from ONE map-only signature pass; finding old band assignments is ONE map-only index scan against the BROADCAST removal key set (the historical index never shuffles); the rewrite reads only the touched (band_idx, bucket) partitions (PartitionFilters) before a dynamic-partition-overwrite replaces exactly those directories; the serve probe partition-prunes to the probe's own band partitions, broadcasts the probe bands onto the pruned scan (the dedup_incremental asymmetry), caps frequent buckets, and tokenizes only CANDIDATE index docs — O(delta + touched-partition bytes) per refresh, never O(index)"),
    ("ivf_pq_index_upsert", "staged IVF-PQ incremental index maintenance (build -> serve -> MAINTAIN): the CDC delta is encoded by ONE map-only pass under the frozen model, finding old list assignments is ONE map-only index scan against the BROADCAST delta key set (the historical index never shuffles), and the rewrite reads only the touched partitions (PartitionFilters on list_id) before a dynamic-partition-overwrite replaces exactly those directories; the serve half partition-prunes to the probed lists and runs the shared _pq_serve kernel — O(delta + touched-list bytes) per refresh, never O(index)"),
    ("events_quantile_sketch", "mergeable rank sketch (promoted r11): BOTH bottom-k levels plan as partial/final WindowGroupLimit pairs (every input partition forwards <= k rows per group into its exchange); rank selection runs on the k-row sample; types-sized totals broadcast"),
    ("stream_sliding", "sliding windows (micro-batch plan below): each event expands to its covering windows MAP-side, then partial agg -> ONE REQUIRED_BY_STATEFUL_OPERATOR exchange -> StateStoreRestore/Save — state is one counter per (window, type), never per event; batch half reads the memory sink, zero parquet"),
    ("stream_dedup", "watermark-bounded streaming dedup (micro-batch below): StreamingDeduplicateWithinWatermark holds one row per key only until the watermark passes — ONE stateful exchange, zero aggregate state, the continuous half of dedup_exact"),
    ("stream_enrich", "stream-static enrich (micro-batch below): the dimension joins INSIDE each micro-batch as an ordinary BroadcastHashJoin — static sides never enter streaming state; the only stateful operator is the downstream windowed aggregate behind its ONE exchange"),
    ("stream_click_attr", "stream-stream attribution join (micro-batch below): StreamingSymmetricHashJoin with BOTH sides exchanged REQUIRED_BY_STATEFUL_OPERATOR; watermarks bound both buffers, so join state is the watermark horizon, not the stream"),
    ("sessionize", "lag-cascade sessionization rollup: gap marks, session numbering and the per-user rollup all partition on user_id, so EnsureRequirements plans ONE user exchange for the whole cascade; one parquet scan, zero joins"),
    ("events_kmv_distinct", "two-level k-min tree: distinct hashes -> per-(group, salt) k smallest -> global k smallest, ALL as partial/final aggregates — no aggregation state exceeds n_salt x k values and there is NO per-group window funnel (zero Window operators)"),
    ("media_meta_stats", "metadata-only media inventory: Catalyst prunes the payload synthesis ENTIRELY out of the executed plan (no content/encode expression survives) — on a real media table this scan reads only (modality, meta), the column-pruning shape that makes 100 TB media tables cheap to inventory"),
    ("media_frames", "video frame-sampling fan-out: ONE Arrow-batched MapInPandas performs the rows-out > rows-in expansion (the single Python crossing); the per-media count is an ordinary partial/final aggregate above it"),
    ("salted_events_enrich", "static skew salting: the skewed stream side gets its salt as a MAP-side hash column; only the KEY-COUNT-sized dim side explodes by the constant salt factor before broadcasting — the stream is never replicated, and the join stays broadcast"),
    ("split_assign", "train/val/test assignment: a pure map-only md5-slice hash decision — zero joins, zero aggregates; the only exchanges are the narrow-scan rebalance and the presentation sort"),
    ("events_window_funcs", "analytic-function SQL: ROW_NUMBER/NTILE/PERCENT_RANK/CUME_DIST/LEAD all share ONE window spec, so the plan carries exactly ONE Window operator over one sort exchange"),
    ("ngram_top", "n-gram frequency mining: the explode is absorbed by a map-side partial count (the shuffle carries one row per distinct gram, not the exploded stream); top-N is TakeOrderedAndProject heaps — no global sort"),
    ("quality_score", "Gopher-style quality signals: pure map-only JVM expressions over one scan — zero joins/aggregates/windows; the only exchanges are the narrow-scan rebalance and the presentation sort"),
    ("token_count", "token counting: same map-only contract as quality_score — one scan, zero joins/aggregates/windows; whitespace + BPE-ish regex all inside whole-stage codegen"),
    ("anomaly_days", "per-user anomaly days: fact rows collapse to (user, day) counts in a partial/final aggregate BEFORE the mean/stddev window — the stats window runs on user-day cardinality, never raw events; integer variance cross-multiplication, zero joins"),
    ("event_sequences", "training-sequence construction: ONE user_id exchange; the time-ordering is array_sort INSIDE the aggregate (per-group, map-side partial collect) — no global ordering of the fact table"),
    ("events_json", "semi-structured extraction: typed from_json evaluates once per row map-side (malformed payloads become NULLs in the same pass); one aggregate exchange after, single scan"),
    ("events_pivot", "pivot: Spark's native two-phase pivot — both aggregate levels split partial/final, zero joins, one scan; the wide schema is a projection, not a self-join per column"),
    ("events_unpivot", "unpivot/melt: native unpivot plans as ONE map-side Expand — zero joins, zero Generate, no shuffle beyond the aggregate it inverts"),
    ("retention", "cohort retention: cohort assignment is a min-day window over (user, day) rows already collapsed by a partial/final aggregate; the cohort/day matrix aggregates are all partial/final; one scan, zero joins"),
    ("simhash_signatures", "SimHash build: corpus = documents UNION an augmented slice (2 scans, the slice's modulo filter evaluated AT its scan); signature = explode -> 32 conditional SUMs as ONE partial/final aggregate — one slim 32-long row per doc per map partition crosses the shuffle (the map-only HOF fold benched 2-4x slower; aggregates beat interpreted lambdas)"),
    ("ann_lsh", "LSH ANN: sign-bucket probe join on the bucket EQUI-key with the tiny query side broadcast; per-query rank window bounded by candidate volume; the frequent-bucket skew guard is SIZE-GATED (absent below 10k vectors — this plan — present above, both directions plan-tested)"),
    ("embedding_dedup", "embedding near-dup: sign-bucket self-join on the bucket equi-key (never all-pairs); exact cosine verify is a map-side filter on the pair rows; same size-gated bucket-cap guard as ann_lsh"),
    ("q1", "TPC-H pricing summary: ONE scan with the shipdate predicate pushed, partial/final aggregate split around one exchange — the canonical map-side-combine shape"),
    ("q13", "customer order-count distribution: the NOT LIKE references only the inner side, so Catalyst pushes it BELOW the LEFT OUTER join into the orders branch (filter runs before the build; outer rows NULL-extend after) — never a post-join filter that would drop them; two stacked partial/final aggregates (per-customer count, then histogram)"),
    ("q15", "top-supplier view script (3 statements through Engine.sql_script): the revenue view materializes as a subplan reused by the max-revenue scalar and the final join — the multi-statement path the reference itself #[ignore]s in its integration test"),
    ("q17", "correlated scalar subquery DECORRELATED: the per-part avg-quantity computes as ONE grouped aggregate joined back to lineitem — never a per-row re-execution of the subquery; the 0.2*avg predicate is a post-join filter"),
    ("q18", "large-volume customers: the HAVING-subquery plans as a LeftSemi join against the grouped quantity aggregate; top-100 is TakeOrderedAndProject heaps, never a global sort"),
    ("q20", "nested IN/EXISTS chain (part -> partsupp -> lineitem availability): every quantifier becomes a LeftSemi equi-join — zero nested-loop joins at any link of the chain"),
    ("q21", "waiting-supplier query: EXISTS -> LeftSemi, NOT EXISTS -> LeftAnti, both as equi-joins on l_orderkey beside the 4-way fact join; top-100 via TakeOrderedAndProject"),
    ("q2", "min-cost supplier: the correlated min(ps_supplycost) subquery decorrelates to a partsupp aggregate joined back (fact-fact, SMJ is the scale-safe choice there); all dimension hops broadcast; top-100 via TakeOrderedAndProject"),
    ("q4", "order priority check: EXISTS(lineitem) plans as ONE LeftSemi equi-join on l_orderkey — never a per-order probe; partial/final count after"),
    ("q5", "local supplier volume: a 6-table chain where every dimension hop broadcasts; ONE aggregate exchange for the revenue rollup"),
    ("q7", "volume shipping: nation pair filter rides the broadcast dim joins; the supp/cust nation cross-condition is a join-level OR residual, not a cartesian"),
    ("q8", "national market share: 8-table join, all dims broadcast; the CASE share numerator folds into ONE partial/final aggregate over the year group"),
    ("q9", "product-type profit: profit expression computed map-side under 5 broadcast joins; ONE aggregate exchange on (nation, year)"),
    ("q10", "returned-item ranking: 4-way join with dims broadcast; top-20 customers via TakeOrderedAndProject heaps — zero global sorts, zero extra exchanges beyond the aggregate"),
    ("q11", "important stock: the HAVING threshold is the SAME aggregate shape computed once over the group and once globally (two partial/final pairs); value scan never repeats per group"),
    ("q12", "shipmode priority: one lineitem-orders join (date predicates pushed to the lineitem scan); CASE priority buckets fold into the partial aggregate"),
    ("q14", "promo revenue: single join + ONE aggregate carrying both the conditional numerator and the total — no second pass for the denominator"),
    ("q16", "supplier-part counts: NOT IN(complaint suppliers) plans as a LeftAnti equi-join; distinct supplier count via two-level aggregate"),
    ("q19", "discounted revenue: the three OR-of-AND predicate arms evaluate as ONE join residual over a single lineitem-part join — brackets/quantity/shipmode conditions pushed where single-table"),
    ("q22", "global sales opportunity: NOT EXISTS(orders) as a LeftAnti equi-join; the avg-balance threshold is a 1-row broadcast scalar; cntrycode buckets fold into partial/final aggregates"),
    ("q1_decimal", "q1 on DECIMAL(12,2) arithmetic end-to-end: same single-scan partial/final split as q1 — decimal promotion happens inside the aggregate expressions, no extra passes"),
    ("events_agg_count", "ad-hoc aggregate: one scan, partial/final count split — the distributed_aggregation.rs analog"),
    ("events_cte_join", "CTE + join: the CTE materializes as a subplan feeding a broadcast join; two aggregates (CTE side + outer rollup), never a re-execution per consumer"),
    ("events_daily", "daily rollup: day truncation is a map-side expression; ONE partial/final aggregate exchange"),
    ("events_rolling", "rolling window: ONE Window operator over one sort exchange — frame bounds never re-sort per row"),
    ("events_topk", "per-group top-k: rank window + filter; the rank<=N filter is the WindowGroupLimit candidate shape; one scan"),
    ("events_rollup", "ROLLUP grouping sets: ONE map-side Expand feeds a single partial/final aggregate — never one pass per grouping set"),
    ("events_setops", "INTERSECT/EXCEPT: set ops plan as LeftSemi/LeftAnti equi-joins over aggregated distinct branches plus one Union — no nested-loop membership probes"),
    ("events_median", "exact median: percentile_approx-free rank selection inside ONE partial/final aggregate pair; single scan"),
    ("events_latest", "latest-event-per-user: ONE row_number window over the user exchange, rank-1 filter — the argmax shape without a self-join"),
    ("embedding_topk", "brute-force cosine top-k (the BASELINE the ANN variants beat): the K-row query side broadcasts into a BroadcastNestedLoopJoin — the all-pairs scoring IS the contract here, corpus scanned once map-side; per-query rank window after"),
    ("embedding_quantize", "int8 scalar quantization: a pure map-only ppm-integer pipeline — one scan, zero joins/aggregates; the magnitude/sign split keeps every division non-negative"),
    ("media_dedup", "payload-digest media dedup: ONE (modality, digest) hash exchange with partial/final aggregate — only the 16-byte digest shuffles, never payload bytes"),
    ("stratified_sample", "per-stratum sampling: md5-slice priorities map-side, ONE rank window partitioned by stratum — no global sort, no join"),
    ("chunk_documents", "document chunking: ONE Generate (posexplode of computed chunk bounds) over one scan — zero joins, zero aggregates; output rows = chunks"),
    ("pack_sequences", "sequence packing: greedy bin assignment via ONE running-sum window + integer DIV, then a per-bin aggregate — no iterative loop, no join"),
    ("decontaminate", "eval-set decontamination: eval n-grams explode into a BROADCAST LeftSemi probe against corpus n-grams — the corpus is filtered before any wide work; two Generates (corpus + eval sides), never a cartesian"),
    ("pii_scrub", "PII scrubbing: pure map-only regexp_replace chain over one scan — zero joins/aggregates/windows; redaction counts are map-side expressions"),
    ("domain_mix", "domain mixture weights: per-source aggregates with the 1-row corpus totals as a broadcast scalar (BroadcastNestedLoopJoin on a single row IS the scalar join); ppm-floor integer weights"),
    ("shuffle_shards", "deterministic corpus shuffling: md5-slice shard assignment map-side, ONE window for the within-shard order — reproducible at any parallelism, no global sort"),
    ("cdc_apply_changes", "CDC merge: the SNAPSHOT side never shuffles — changes broadcast onto it (BuildRight), tombstones filter post-join, inserts union in; the only exchange is the presentation sort (the fixture derives its change branches from the base table, hence the extra scans; a real feed reads a changes table)"),
    ("text_stats", "text statistics: map-only JVM expressions over one scan — the zero-shuffle scoring contract shared by the text tier"),
    ("lang_id", "n-gram language ID: stopword/character-class heuristics as map-only expressions — no vocabulary join, no shuffle beyond presentation"),
    ("fingerprint", "rolling-hash document fingerprinting: polynomial hash folds map-side — one scan, zero exchanges beyond rebalance + presentation"),
]

# Queries whose audited shape is AQE's RUNTIME decision (broadcast
# conversion from actual pairs-sized stats): execute before dumping so
# PLANS.md records the final adaptive plan, not the static SMJ guess.
EXECUTE_FIRST = {"corpus_pipeline", "dedup_clusters", "dedup_clusters_star"}


def main() -> int:
    import __spark_entry__ as entry_mod
    from datafusion_distributed_experiment_spark import build_session
    from datafusion_distributed_experiment_spark.plans import (
        normalized_plan,
        pushed_filters,
        stage_summary,
    )

    spark = build_session(
        app_name="dump-plans",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from datafusion_distributed_experiment_spark.operators import staged_queries

    queries = {**entry_mod.queries(), **staged_queries()}

    out = [
        "# Physical plans of the headline operators",
        "",
        "Regenerated by `python scripts/dump_plans.py` (sf0.001, local[4], 4",
        "shuffle partitions; volatile ids scrubbed by `plans.normalized_plan`).",
        "Each section notes the scale property the plan is evidence for; the",
        "matching machine-checked assertion lives in `tests/test_plans.py` /",
        "`tests/test_analytics.py`.",
        "",
    ]
    for name, why in SHOWCASE:
        df = queries[name](spark, SF_DIR)
        if name in EXECUTE_FIRST:
            df.collect()
        s = stage_summary(df)
        pf = pushed_filters(df)
        out.append(f"## {name}")
        out.append("")
        out.append(f"**Why it matters**: {why}")
        out.append("")
        out.append(
            f"**Stage summary**: exchanges={s['exchanges']} broadcasts={s['broadcasts']} "
            f"sorts={s['sorts']} aggregates={s['aggregates']}"
        )
        if pf:
            shown = [f for f in pf if f.strip()]
            if shown:
                out.append(f"**Pushed filters**: `{'; '.join(shown)}`")
        out.append("")
        out.append("```")
        out.append(normalized_plan(df, "simple"))
        out.append("```")
        from datafusion_distributed_experiment_spark.streaming.events import (
            LAST_STREAM_PLANS,
        )

        if name in LAST_STREAM_PLANS:
            # the stateful plan never surfaces through the returned batch
            # frame (it reads the memory sink); run_to_completion captured
            # the executed micro-batch plan during the drain above
            from datafusion_distributed_experiment_spark.plans import normalize_text

            out.append("")
            out.append("**Executed micro-batch plan** (the stateful half):")
            out.append("")
            out.append("```")
            out.append(normalize_text(LAST_STREAM_PLANS[name]))
            out.append("```")
        out.append("")

    with open("/root/repo/PLANS.md", "w") as fh:
        fh.write("\n".join(out))
    print(f"PLANS.md written ({len(SHOWCASE)} plans)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
