#!/bin/bash
# Round-11 one-decade-up gate (round-10 verdict task #2): the round-10
# families — graph-ANN, retrieval, sketch merges, streaming NB/HLL/graph,
# candidate-budget ngram, pairs compaction — existed only at sf0.01; this
# runs them at sf1 (builder-generated via tools/gen_sf.py out/sf1 1.0)
# engine-first, then oracle-compares the same subset in DuckDB.
#
# Usage: tools/run_sf1_r11.sh [outDir=out/verify_sf1_r11]
set -u
cd "$(dirname "$0")/.."
SF=${SF_DIR:-out/sf1}
OUT=${1:-out/verify_sf1_r11}
QUERIES="q_knn_graph q_graph_search q_graph_search_filtered q_graph_upsert \
q_graph_recall q_stream_graph q_hybrid_rrf q_mmr_rerank q_snippets \
q_prf_expand q_retrieval_metrics q_pairs_compact q_dedup_ngram_budget \
q_hll_merge q_kmv_merge q_stream_nb q_stream_hll q_dedup_simhash \
q_dedup_ngram_adaptive"

mkdir -p "$OUT"
t0=$(date +%s)
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-24g} \
  sbt -batch "runMain graft.Verify $SF $OUT $QUERIES" > "$OUT/engine.log" 2>&1
rc=$?
echo "engine rc=$rc wall=$(( $(date +%s) - t0 ))s" | tee "$OUT/gate.log"
[ $rc -ne 0 ] && { grep -E "error:|Exception" "$OUT/engine.log" | head -5; exit $rc; }

# oracle pass, one query at a time so a single heavy DuckDB oracle that
# exhausts the box fails that row alone (the fresh_con-per-query contract,
# plus per-query wall visibility in gate.log)
for q in $QUERIES; do
  t1=$(date +%s)
  res=$(python3 tools/oracle_check.py "$SF" "$OUT" "$q" 2>&1 | grep -E "^(PASS|FAIL|WARN)")
  echo "$res [$(( $(date +%s) - t1 ))s]" | tee -a "$OUT/gate.log"
done
echo "== $(grep -c '^PASS' "$OUT/gate.log") pass / $(grep -c -E '^(FAIL|WARN)' "$OUT/gate.log") fail ==" \
  | tee -a "$OUT/gate.log"
