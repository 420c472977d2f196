#!/bin/bash
# Round-12 probe chain (sequential, idle-host measurements):
#  1. ProbeStream at sf1 over 5 triggers (r11 task 7)
#  2. ProbeE15 at sf100docs — third-decade incremental candidates (task 5)
#  3. BenchOne d10/e15 at sf100docs — third-decade incremental wall
#  4. ProbeS13Cold at sf10full — s13 cold vs served at k=64 (task 2)
set -u
cd /root/repo
JOPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx48g"
CP="/opt/spark/jars/*:target/scala-2.13/classes"
run() { echo "=== $* : $(date -Is)"; java $JOPTS -cp "$CP" "$@"; echo "=== rc=$? : $(date -Is)"; }
run graft.tools.ProbeStream target/testdata-local/sf1 5
run graft.tools.ProbeE15 target/testdata-local/sf100docs
run graft.BenchOne d10_incremental_dedup target/testdata-local/sf100docs 3
run graft.BenchOne e15_stream_dedup target/testdata-local/sf100docs 3
run graft.tools.ProbeS13Cold target/testdata-local/sf10full
echo "=== PROBES DONE: $(date -Is)"
