#!/bin/bash
# Round-15 task 4 proof: q12 at sf100star with DEFAULT knobs must
# FINISH and oracle-PASS (r14: default knobs DISK-FULLed in five
# chained fact-sized sort-merge joins once the dims outgrew the 10 MB
# broadcast default — PERF 14d). With Scale.dimJoin, oversized dims now
# fall back to SHUFFLE_HASH automatically. Three legs:
#   1. BenchOne q12, DEFAULT knobs (32 shuffle partitions, 10 MB
#      broadcast ceiling) — completion + wall + cpu
#   2. BenchOne q12, r14's tuned knobs (512 MB ceiling) — the broadcast
#      regime for comparison; digests must agree
#   3. Verify dump + DuckDB oracle at DEFAULT knobs — the PASS proof
# Usage: run_star_q12_r15.sh [classdir] [logfile]
# pipefail so the logged rc after each `java | grep` leg reflects the
# JVM, not grep (r15 advisory: a mid-run JVM crash used to log rc=0).
set -u -o pipefail
cd /root/repo
CLS=${1:-target/scala-2.13/classes}
LOG=${2:-target/star_q12_r15.log}
SF=target/testdata-local/sf100star
JOPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx48g"
: > "$LOG"
echo "=== q12 @ sf100star, DEFAULT knobs (the r14 DISK-FULL case) $(date -Is)" >> "$LOG"
( cd "$(mktemp -d)" && env -u SPARK_GRAFT_SHUFFLE_PARTITIONS -u SPARK_GRAFT_BROADCAST_THRESHOLD \
    java $JOPTS -cp "/opt/spark/jars/*:/root/repo/$CLS" \
    graft.BenchOne q12_export_join "/root/repo/$SF" 2 2>&1 | grep -E "^\[bench-one\]" ) >> "$LOG"
echo "--- rc=$? $(date -Is)" >> "$LOG"
echo "=== q12 @ sf100star, tuned knobs (512MB ceiling — broadcast regime)" >> "$LOG"
( cd "$(mktemp -d)" && SPARK_GRAFT_BROADCAST_THRESHOLD=536870912 SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
    java $JOPTS -cp "/opt/spark/jars/*:/root/repo/$CLS" \
    graft.BenchOne q12_export_join "/root/repo/$SF" 2 2>&1 | grep -E "^\[bench-one\]" ) >> "$LOG"
echo "--- rc=$? $(date -Is)" >> "$LOG"
echo "=== q12 @ sf100star, DEFAULT-knob Verify dump + oracle" >> "$LOG"
VOUT=target/vout_star_q12_r15
rm -rf "$VOUT"
env -u SPARK_GRAFT_SHUFFLE_PARTITIONS -u SPARK_GRAFT_BROADCAST_THRESHOLD \
  java $JOPTS -cp "/opt/spark/jars/*:/root/repo/$CLS" \
  graft.Verify "$SF" "$VOUT" "q12_export_join" >> "$LOG" 2>&1
echo "--- verify rc=$? $(date -Is)" >> "$LOG"
tools/run_oracle_sfN.sh "$SF" "$VOUT" "${LOG%.log}_oracle.txt" >> "$LOG" 2>&1
echo "=== done $(date -Is)" >> "$LOG"
