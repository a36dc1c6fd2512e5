#!/usr/bin/env bash
# CI-style pre-snapshot gate: refuses a green verdict unless the FULL pytest
# suite and the FULL sf0.001 oracle sweep both pass, and records their complete
# output in a committed artifact (GATE.txt) so the pass counts are reproducible
# evidence rather than prose (round 3's silent rot — data drift breaking 10
# tests with nobody noticing — is exactly what this catches).
#
# Usage: bash scripts/gate.sh        # from the repo root
# Exit 0 = safe to snapshot; nonzero = DO NOT commit a green claim.
set -u
cd "$(dirname "$0")/.."
ART=GATE.txt
{
  echo "== gate run $(date -u +%Y-%m-%dT%H:%M:%SZ) @ $(git rev-parse --short HEAD 2>/dev/null || echo 'no-commit') =="
  echo
  echo "-- pytest tests/ -q --"
} > "$ART"

python -m pytest tests/ -q >> "$ART" 2>&1
PYTEST_RC=$?

{
  echo
  echo "-- oracle sweep sf0.001 (scripts/verify_correctness.py) --"
} >> "$ART"
python scripts/verify_correctness.py /root/testdata/sf0.001 >> "$ART" 2>&1
ORACLE_RC=$?

# sf0.1 subset: the most data-sensitive operators (timestamp handling,
# watermark-bounded state, LSH candidate volume, iterative convergence) —
# the class where correctness rot has historically tracked DATA SCALE, not
# code (round 3's timestamp-unit drift passed at sf0.001). The driver only
# verifies sf0.01; the bench runs sf0.1; this closes that gap.
{
  echo
  echo "-- oracle sweep sf0.1 subset (data-sensitive operators) --"
} >> "$ART"
python scripts/verify_correctness.py /root/testdata/sf0.1 \
  events_asof events_range_join events_kmv_distinct sessionize user_sessions \
  stream_click_attr stream_dedup stream_enrich stream_sliding \
  minhash_dedup_pairs dedup_incremental dedup_clusters \
  minhash_pairs_skew kmeans_lloyd_t3 ngram_span_dedup \
  stream_topk hll_distinct weighted_sample bpe_apply \
  domain_token_profile events_quantile_sketch ivf_pq_topk \
  ivf_pq_index_build ivf_pq_index_upsert >> "$ART" 2>&1
SF01_RC=$?

# Spill-pressure pass: sort/window/as-of queries under 128-row force-spill
# thresholds must still hash-match AND show nonzero spillSize in the
# executed plan — the reference's --memory-limit/FairSpillPool parity
# (benchmarks/src/util/options.rs:90-115) proven, not just plumbed.
{
  echo
  echo "-- spill-pressure sweep sf0.01 (scripts/verify_spill.py) --"
} >> "$ART"
python scripts/verify_spill.py /root/testdata/sf0.01 >> "$ART" 2>&1
SPILL_RC=$?

# Staged operators (operators.staged_queries — no driver-window slot until
# the next rotation) verified at the driver's sf0.01 scale.
{
  echo
  echo "-- staged-operator sweep sf0.01 (scripts/verify_staged.py) --"
} >> "$ART"
python scripts/verify_staged.py /root/testdata/sf0.01 >> "$ART" 2>&1
STAGED_RC=$?

{
  echo
  echo "== result: pytest rc=$PYTEST_RC oracle rc=$ORACLE_RC sf0.1-subset rc=$SF01_RC spill rc=$SPILL_RC staged rc=$STAGED_RC =="
} >> "$ART"

tail -n 5 "$ART"
if [ "$PYTEST_RC" -ne 0 ] || [ "$ORACLE_RC" -ne 0 ] || [ "$SF01_RC" -ne 0 ] || [ "$SPILL_RC" -ne 0 ] || [ "$STAGED_RC" -ne 0 ]; then
  echo "GATE RED — do not snapshot. Full output in $ART" >&2
  exit 1
fi
echo "GATE GREEN — $ART updated"
