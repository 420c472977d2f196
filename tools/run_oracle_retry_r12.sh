#!/bin/bash
# Round-12 sf10full oracle RETRY wave: the rows the single-connection
# sweep lost to accumulated staged temp tables / disk-spill pressure
# (see PERF.md 12h). One check_oracle PROCESS per query — fresh DuckDB
# connection, full temp headroom — with the string-heavy chains staged.
set -u
cd /root/repo
run_one() { # name stagespec
  echo "=== $1: $(date -Is)  free=$(df -h / | tail -1 | awk '{print $4}')"
  python3 tools/check_oracle.py --pyuf --only="$1" ${2:+--stage=$2} \
    target/testdata-local/sf10full target/vout_sf10full \
    2>&1 | grep -E "PASS|FAIL" | tee -a target/oracle_retry_r12.txt
}
: > target/oracle_retry_r12.txt
run_one d10_incremental_dedup  d10_incremental_dedup:sh+sig
run_one d16_containment_audit  d16_containment_audit:sh+sig
run_one e15_stream_dedup       e15_stream_dedup:sh+sig
run_one p01_curation_ledger    p01_curation_ledger:sh+sig
run_one p05_loss_attribution   p05_loss_attribution:sh+sig
run_one p08_split_leakage      p08_split_leakage:sh+sig
run_one s08_crossmodal_audit   s08_crossmodal_audit:sh+sig
run_one s09_knn_graph          s09_knn_graph:vb
echo "=== RETRY DONE: $(date -Is)"
# The t-family + s11/s14 rows died of the leaked-connection OOM (fixed in
# check_oracle; they pass unstaged on a fresh connection — r11 proved the
# same texts at the same doc scale). Grouped per-family invocations:
run_one s11_knn_components ""
run_one s14_centroid_drift ""
for q in t01 t02 t03 t04 t06 t07 t08 t09 t10 t11 t12 t13 t14 t15 t16 t17 t18; do
  run_one "$q" ""
done
echo "=== RETRY DONE (incl. t-family): $(date -Is)"
