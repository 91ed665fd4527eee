#!/bin/bash
# Two-decades-up campaign runbook (round-9 verdict #1): run the heavy-tail
# queries one at a time at sf10 (500k docs, builder-generated via
# tools/gen_sf.py out/sf10 10.0), with the disk hygiene guards CLAUDE.md
# records and LOUD per-query failure (graft.Verify exits nonzero under
# `only` since round 10 — an ENOSPC can no longer log as "exit 0").
#
# Usage: tools/run_sf10.sh [outDir=out/verify_sf10] [query...]
set -u
cd "$(dirname "$0")/.."
SF=${SF_DIR:-out/sf10}
OUT=${1:-out/verify_sf10}
shift 2>/dev/null || true
QUERIES=("$@")
if [ ${#QUERIES[@]} -eq 0 ]; then
  QUERIES=(q_dedup_minhash q_dedup_ngram q_dedup_ngram_capped
    q_dedup_ngram_adaptive q_dedup_simhash q_dedup_embed
    q_dedup_embed_adaptive q_dedup_semantic q_dedup_recall
    q_pairs_incremental q_span_dedup q_span_removed q_phash_dedup
    q_phash_dedup_wide q_phash_artifact q_stream_pairs)
fi

# disk guards: sweep leftover Spark shuffle scratch and DuckDB temp ONLY
# when no java/duckdb process is alive (the rm races a starting JVM
# otherwise), then require 40 GB free before each heavy query
sweep() {
  if ! pgrep -x java >/dev/null && ! pgrep -f duckdb >/dev/null; then
    rm -rf /tmp/blockmgr-* /tmp/spark-* .tmp/duckdb_temp_storage* 2>/dev/null
  fi
}
free_gb() { df -BG --output=avail / | tail -1 | tr -dc '0-9'; }

mkdir -p "$OUT"
: > "$OUT/campaign.log"
for q in "${QUERIES[@]}"; do
  # low disk is often TRANSIENT (a concurrent DuckDB oracle's spill file
  # lives only for the duration of one query — observed eating 40 GB then
  # vanishing): WAIT for space to return, up to 30 min, before skipping
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
  SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
    sbt -batch "runMain graft.Verify $SF $OUT $q" \
    > "$OUT/$q.log" 2>&1
  rc=$?
  t1=$(date +%s)
  echo "$q exit=$rc wall=$((t1 - t0))s disk_after=$(free_gb)G" \
    | tee -a "$OUT/campaign.log"
done
echo "campaign done: $(grep -c 'exit=0' "$OUT/campaign.log")/${#QUERIES[@]} ok"
