#!/bin/bash
# Round-16: d03/d14 serve the scored_* candidate artifact — cold-JVM proof
# at sf10full, same protocol as run_serve_d_r16.sh (drop → one BUILD JVM →
# one fresh SERVE JVM per query, 3 iters). r15 sweep baselines: d03 13.34 s
# wall / 216.3 CPU-s, d14 19.27 s / 434.8 CPU-s (bench/scaling_r15/
# bench_sf10full.json). NOTE: clearScoredCache only drops scored_*; the
# shingle artifact is dropped too so the build leg shows the full cold cost.
# Usage: run_serve_scored_r16.sh [classdir] [logfile] [sfdir]
set -u -o pipefail
cd /root/repo
CLS=${1:-target/scala-2.13/classes}
LOG=${2:-target/serve_scored_r16.log}
SF=${3:-target/testdata-local/sf10full}
JOPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx48g"
run_one() { # name iters
  java $JOPTS -cp "/opt/spark/jars/*:$CLS" graft.BenchOne "$1" "$SF" "$2" 2>&1 \
    | grep -E "^\[bench-one\]"
  echo "--- rc=$? $(date -Is)"
}
: > "$LOG"
echo "=== leg 0: drop artifacts (cold warehouse) $(date -Is)" >> "$LOG"
java $JOPTS -cp "/opt/spark/jars/*:$CLS" graft.tools.DropServeArtifacts "$SF" >> "$LOG" 2>&1
echo "--- rc=$? $(date -Is)" >> "$LOG"
echo "=== leg 1: BUILD (fresh JVM, d03 1 iter — builds shingles_* + scored_*) $(date -Is)" >> "$LOG"
( run_one d03_minhash_lsh 1 ) >> "$LOG"
echo "=== leg 2: SERVE (one fresh JVM per query, 3 iters) $(date -Is)" >> "$LOG"
for q in d03_minhash_lsh d14_threshold_sweep; do
  echo "--- serve $q" >> "$LOG"
  ( run_one "$q" 3 ) >> "$LOG"
done
echo "=== done $(date -Is)" >> "$LOG"
