#!/bin/bash
# Round-17 sweep leg: the sf10full prebuild-shaped bench at r17 HEAD,
# like-for-like with bench/scaling_r16/bench_sf10full_prebuild.json
# (r16 base: 290.5 s wall / 3,947.2 CPU-s timed, prebuild_s 1,658.9).
# Same corpus recipe (seed-deterministic regeneration via
# tools/gen_sf_local.py 500000 200000 target/testdata-local/sf10full 100),
# same consume harness, frozen classes, leg in its own working dir (cold
# warehouse — the prebuild pass pays every artifact build untimed and
# reports prebuild_s/prebuild_builds; the GC sweep logs its count).
set -u -o pipefail
cd /root/repo
REPO=$PWD
OUT=$REPO/target/bench_r17_prebuild
mkdir -p "$OUT"
rm -rf "$OUT/classes"; cp -r target/scala-2.13/classes "$OUT/classes"
[ -f "$OUT/classes/graft/Bench.class" ] || { echo "freeze failed"; exit 1; }
JOPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx48g"
CP="/opt/spark/jars/*:$OUT/classes"
sf=sf10full
echo "=== bench $sf (prebuild, r17): $(date -Is)"
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
echo "=== bench $sf (prebuild, r17) done rc=$rc: $(date -Is)"
