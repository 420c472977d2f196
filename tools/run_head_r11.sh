#!/bin/bash
# Round-11 SHIPPED-code sweep: re-bench sf0.1 / sf1 / sf10 on HEAD
# (adds, beyond the final_r11 sweep: d13 graft_canon byte-walk, the
# s09/s11 shared kNN-edge artifact + observed-metric convergence,
# version-pinned snapshot reads, writer-writer OCC). Same hygiene:
# frozen classes, abort on freeze failure, each leg in its own
# directory, literal sf-field grep before copying the artifact.
# Gate at this code: 272/272 tests, 106/106 sf0.01 oracle (r11g).
set -u
cd /root/repo
REPO=$PWD
OUT=$REPO/target/head_r11
mkdir -p "$OUT"
rm -rf "$OUT/classes"; cp -r target/scala-2.13/classes "$OUT/classes"
[ -f "$OUT/classes/graft/Bench.class" ] || { echo "freeze failed: no compiled classes"; exit 1; }
JOPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx24g"
CP="/opt/spark/jars/*:$OUT/classes"

for sf in sf0.1 sf1 sf10; do
  echo "=== bench $sf: $(date -Is)"
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
  echo "=== bench $sf done rc=$rc: $(date -Is)"
done
echo "=== ALL DONE: $(date -Is)"
