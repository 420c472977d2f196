#!/bin/bash
# Round-13 probe chain (run AFTER the bench sweep, frozen classes):
#  1. ProbeStream at sf10full — DedupStream second-decade leg (r12 task 7)
#  2. BenchOne t01/t03/t04/t08/t11 at sf100docs — t-family third decade
#     after the byte-walks (r12 task 5)
set -u
cd /root/repo
CLS=target/bench_r13/classes
[ -f "$CLS/graft/Bench.class" ] || { echo "no frozen classes"; exit 1; }
JOPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx48g"
run() { echo "=== $*: $(date -Is)"; java $JOPTS -cp "/opt/spark/jars/*:$CLS" "$@" 2>/dev/null; echo "=== done rc=$?: $(date -Is)"; }
run graft.tools.ProbeStream target/testdata-local/sf10full 5
for q in t01_language_id t03_token_counts t04_fingerprint t08_repetition t11_pii_scan; do
  run graft.BenchOne $q target/testdata-local/sf100docs 3
done
echo "=== PROBES DONE: $(date -Is)"
