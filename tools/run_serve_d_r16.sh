#!/bin/bash
# Round-16 task 3 proof: the d-chain's contamination/containment state is
# served from persisted catalog artifacts (h60_*, contam_*, contaud_*), so a
# COLD JVM against a warm warehouse reads tables instead of re-deriving
# shingles + pair joins. Success bar (r15 verdict task 3): cold-session
# BenchOne for d07/d15/d16 drops >=5x vs the r15 A/B standalone legs
# (d07 91.8 s / d15 124.1 s / d16 27.2 s at sf10full) with digests unchanged
# (39bb89c1cee7eb1d / d1642b6301a9994f / 7eff34a1eeb908da).
# Legs:
#   0. drop the artifacts (truly cold warehouse for this corpus state)
#   1. BUILD leg: one fresh JVM runs d07 (builds h60_* + contam_*), then d16
#      (builds contaud_* reusing shingles_*) — the once-per-corpus cost
#   2. SERVE legs: one fresh JVM per query, 3 iters — the steady state
# Usage: run_serve_d_r16.sh [classdir] [logfile] [sfdir]
set -u -o pipefail
cd /root/repo
CLS=${1:-target/scala-2.13/classes}
LOG=${2:-target/serve_d_r16.log}
SF=${3:-target/testdata-local/sf10full}
JOPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx48g"
run_one() { # name iters
  java $JOPTS -cp "/opt/spark/jars/*:$CLS" graft.BenchOne "$1" "$SF" "$2" 2>&1 \
    | grep -E "^\[bench-one\]"
  echo "--- rc=$? $(date -Is)"
}
: > "$LOG"
echo "=== leg 0: drop contam/contaud artifacts (cold warehouse) $(date -Is)" >> "$LOG"
java $JOPTS -cp "/opt/spark/jars/*:$CLS" graft.tools.DropServeArtifacts "$SF" >> "$LOG" 2>&1
echo "--- rc=$? $(date -Is)" >> "$LOG"
echo "=== leg 1: BUILD (fresh JVM, d07 then d16, 1 iter each) $(date -Is)" >> "$LOG"
( run_one d07_contamination 1 ) >> "$LOG"
( run_one d16_containment_audit 1 ) >> "$LOG"
echo "=== leg 2: SERVE (one fresh JVM per query, 3 iters) $(date -Is)" >> "$LOG"
for q in d07_contamination d15_decontaminate_apply d16_containment_audit; do
  echo "--- serve $q" >> "$LOG"
  ( run_one "$q" 3 ) >> "$LOG"
done
echo "=== done $(date -Is)" >> "$LOG"
