#!/bin/bash
# Round-12 two-decades-up campaign (round-11 verdict #2/#4/#5): sf10
# engine-complete records for (a) the AUTO-budget ngram (no hand-set
# knob), (b) the graph QUERY path (search / upsert / one stream
# micro-batch) whose build GraphVolProf already profiled, (c) the
# retrieval + curation headline families that had never left sf1.
# Engine-only (the dedup-family sf10 convention: DuckDB cannot run these
# oracles at 500k docs in 48 GB); correctness one decade down is the
# oracle of record.
#
# Usage: tools/run_sf10_r12.sh [outDir=out/verify_sf10_r12] [query...]
set -u
cd "$(dirname "$0")/.."
SF=${SF_DIR:-out/sf10}
OUT=${1:-out/verify_sf10_r12}
shift 2>/dev/null || true
QUERIES=("$@")
if [ ${#QUERIES[@]} -eq 0 ]; then
  QUERIES=(q_dedup_ngram_budget
    q_graph_search q_graph_search_filtered q_graph_upsert q_stream_graph
    q_hybrid_rrf q_bm25 q_curation q_pack_sequences q_pii_redact)
fi

sweep() {
  if ! pgrep -x java >/dev/null && ! pgrep -f duckdb >/dev/null; then
    rm -rf /tmp/blockmgr-* /tmp/spark-* .tmp/duckdb_temp_storage* 2>/dev/null
  fi
}
free_gb() { df -BG --output=avail / | tail -1 | tr -dc '0-9'; }

mkdir -p "$OUT"
# append on a filtered retry — a solo re-run must not erase the campaign's
# earlier rows (learned the hard way, round 12)
[ $# -eq 0 ] && : > "$OUT/campaign.log"
for q in "${QUERIES[@]}"; do
  waited=0
  while :; do
    sweep
    g=$(free_gb)
    [ "$g" -ge 40 ] && break
    if [ "$waited" -ge 1800 ]; then
      echo "$q SKIP disk=${g}G<40G after ${waited}s wait" \
        | tee -a "$OUT/campaign.log"; continue 2
    fi
    sleep 60; waited=$((waited + 60))
  done
  t0=$(date +%s)
  SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-48g} \
    sbt -batch "runMain graft.Verify $SF $OUT $q" \
    > "$OUT/$q.log" 2>&1
  rc=$?
  t1=$(date +%s)
  rows=$(python3 -c "
import pyarrow.parquet as pq, glob, sys
fs = glob.glob('$OUT/$q/*.parquet') + glob.glob('$OUT/$q')
try: print(pq.read_table('$OUT/$q').num_rows)
except Exception: print(-1)" 2>/dev/null)
  echo "$q exit=$rc wall=$((t1 - t0))s rows=$rows disk_after=$(free_gb)G" \
    | tee -a "$OUT/campaign.log"
done
echo "campaign done: $(grep -c 'exit=0' "$OUT/campaign.log")/${#QUERIES[@]} ok"
