#!/bin/bash
# Default DuckDB oracle harness for big (sf >= 1) corpora: ONE
# check_oracle PROCESS PER QUERY.
#
# Why per-process is the default above sf1 (r12 postmortem, promoted to
# mainline by the r13 round): the single-connection sweep shares DuckDB
# state across ~106 queries, so one 75-GB-spill chain exhausts the temp
# volume and every subsequent query dies of the neighbor's footprint —
# the r12 sf10full sweep lost 27 rows to exactly that cascade, and the
# per-query retry wave recovered them all with zero engine changes. A
# fresh process per query gives each mirror the full temp/memory
# headroom and makes every failure attributable to ITS query.
#
# Usage: tools/run_oracle_sfN.sh <sfDir> <voutDir> <logFile>
#   e.g. tools/run_oracle_sfN.sh target/testdata-local/sf10full \
#          target/vout_sf10full target/oracle_sf10full_r13.txt
#
# Iterates the queries that HAVE a Verify dump (an engine cap-refusal
# leaves no dump dir, so d02/d05/d06 on over-cap corpora are skipped by
# construction — their quadratic oracle SQL never runs). Stage specs
# (string-heavy CTE chains DuckDB re-evaluates per reference) follow the
# r11/r12 playbook.
set -u
cd /root/repo
SFDIR=${1:?sfDir}
VOUT=${2:?voutDir}
LOG=${3:?logFile}

stage_for() { # query name -> --stage spec ("" if none)
  case "$1" in
    d03_minhash_lsh|d08_lsh_clusters|d09_dedup_apply|d14_threshold_sweep|\
    d10_incremental_dedup|d16_containment_audit|e15_stream_dedup|\
    p01_curation_ledger|p05_loss_attribution|p08_split_leakage|\
    s08_crossmodal_audit) echo "$1:sh+sig" ;;
    d17_containment_sketch|d18_contamination_sketch|d19_decontaminate_sketch)
      echo "$1:sh+hs" ;;
    d20_boilerplate_strip) echo "$1:w+grams" ;;
    s09_knn_graph) echo "$1:vb" ;;
    *) echo "" ;;
  esac
}

: > "$LOG"
echo "=== oracle per-query sweep: sf=$SFDIR vout=$VOUT $(date -Is)" | tee -a "$LOG"
n=0
for d in "$VOUT"/*/; do
  q=$(basename "$d")
  [ -e "$VOUT/$q/_SUCCESS" ] || [ -n "$(ls "$VOUT/$q"/*.parquet 2>/dev/null)" ] || continue
  spec=$(stage_for "$q")
  echo "--- $q: $(date -Is) free=$(df -h / | tail -1 | awk '{print $4}')" >> "$LOG"
  # r13 advisory: a checker that crashes before printing a verdict
  # (stage-CTE assertion, OOM, traceback) must leave an explicit FAIL
  # line, not a silent gap only visible as a PASS+FAIL total below n.
  out=$(python3 tools/check_oracle.py --pyuf --only="$q" ${spec:+--stage=$spec} \
    "$SFDIR" "$VOUT" 2>&1)
  rc=$?
  verdict=$(printf '%s\n' "$out" | grep -E "^(PASS|FAIL)")
  if [ -z "$verdict" ]; then
    verdict="FAIL $q: harness error (rc=$rc)"
    printf '%s\n' "$out" | tail -15 >> "$LOG"
  fi
  printf '%s\n' "$verdict" | tee -a "$LOG"
  n=$((n + 1))
done
echo "=== sweep done: $n queries, $(grep -c '^PASS' "$LOG") PASS / $(grep -c '^FAIL' "$LOG") FAIL $(date -Is)" | tee -a "$LOG"
