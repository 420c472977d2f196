#!/bin/bash
# Round-15 scaling bench: like-for-like with the r14 sweep (same consume
# harness, same corpora: sf0.1 / sf1 / sf10full), from a frozen class
# dir, each leg in its own working dir. The star third-decade and skew
# legs are separate BenchOne scripts (run_star_r15.sh) — this sweep is
# the round-over-round comparable.
set -u
cd /root/repo
REPO=$PWD
OUT=$REPO/target/bench_r15
mkdir -p "$OUT"
rm -rf "$OUT/classes"; cp -r target/scala-2.13/classes "$OUT/classes"
[ -f "$OUT/classes/graft/Bench.class" ] || { echo "freeze failed"; exit 1; }
JOPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx48g"
CP="/opt/spark/jars/*:$OUT/classes"
for sf in sf0.1 sf1 sf10full; do
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
echo "=== BENCH SWEEP DONE: $(date -Is)"
