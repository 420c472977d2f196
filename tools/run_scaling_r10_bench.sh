#!/bin/bash
# Trimmed round-10 scaling re-measure: ONLY the three bench legs (sf0.1
# control / sf1 / sf1skew) against the round-10 fixes, from a frozen copy
# of the compiled classes. No sf1 verify/oracle leg — the r9 study already
# proved sf1 correctness (105/105) and the round-10 code is oracle-gated
# at sf0.01 by the driver; keeping the sweep short guarantees it cannot
# overlap the driver's end-of-round bench (the r9 lesson). Each leg runs
# in its own working directory so the official target/bench_last.json and
# target/bench_history/* are untouchable from here.
set -u
cd /root/repo
REPO=$PWD
OUT=$REPO/target/scaling_r10
mkdir -p "$OUT"
if [ ! -d "$OUT/classes" ]; then
  cp -r target/scala-2.13/classes "$OUT/classes"
fi
[ -f "$OUT/classes/graft/Bench.class" ] || { echo "freeze failed: no compiled classes"; exit 1; }
JOPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx16g"
CP="/opt/spark/jars/*:$OUT/classes"

for sf in sf0.1 sf1 sf1skew; do
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
