#!/bin/bash
# Round-16 follow-up leg (PERF 16f): the sf10full sweep leg re-run with
# the Bench artifact-prebuild pass (commit 5aead58), to adjudicate the
# 16e finding that in-leg artifact builds polluted later rows' heap
# state (d10 read 618 CPU-s in-leg vs 259 standalone at the same HEAD).
# Like-for-like with bench/scaling_r16/bench_sf10full.json: same corpus
# recipe (seed-deterministic regeneration), same consume harness, frozen
# classes, leg in its own working dir (cold warehouse — the prebuild
# pass pays every artifact build untimed).
set -u -o pipefail
cd /root/repo
REPO=$PWD
OUT=$REPO/target/bench_r16_prebuild
mkdir -p "$OUT"
rm -rf "$OUT/classes"; cp -r target/scala-2.13/classes "$OUT/classes"
[ -f "$OUT/classes/graft/Bench.class" ] || { echo "freeze failed"; exit 1; }
JOPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx48g"
CP="/opt/spark/jars/*:$OUT/classes"
sf=sf10full
echo "=== bench $sf (prebuild): $(date -Is)"
LEGDIR=$OUT/leg_$sf
rm -rf "$LEGDIR" && mkdir -p "$LEGDIR"
( cd "$LEGDIR" && SPARK_GRAFT_SF_DIR=$REPO/target/testdata-local/$sf \
    java $JOPTS -cp "$CP" graft.Bench > "$OUT/bench_$sf.log" 2>&1 )
rc=$?
if [ $rc -eq 0 ] && grep -qF "\"sf\":\"$REPO/target/testdata-local/$sf\"" "$LEGDIR/target/bench_last.json" 2>/dev/null; then
  cp -f "$LEGDIR/target/bench_last.json" "$OUT/bench_$sf.json"
else
  echo "=== bench $sf: NOT copying artifact (rc=$rc or sf-field mismatch)"
fi
echo "=== bench $sf (prebuild) done rc=$rc: $(date -Is)"
