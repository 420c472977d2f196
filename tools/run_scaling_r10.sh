#!/bin/bash
# Full-suite scaling study: bench all queries at sf0.1-local (control) /
# sf1 / sf1skew, then oracle-check all queries at sf1 via DuckDB (--pyuf).
# Runs from a FROZEN copy of the compiled classes so development can
# continue in parallel; benches run first and back-to-back so they see an
# otherwise idle host.
#
# Fixes vs run_scaling_r9.sh (ADVICE r9 + VERDICT r9 item 5):
#  - aborts if the class freeze failed instead of benching an empty classpath
#  - grep -qF: the sf-field guard matches the JSON fragment literally
#  - each leg runs from its OWN working directory, so the sweep can never
#    touch the official target/bench_last.json / target/bench_history/*
#    that a concurrent driver bench writes (round 9's sweep deleted the
#    official r9 artifact 13 minutes after the driver wrote it)
set -u
cd /root/repo
REPO=$PWD
OUT=$REPO/target/scaling_r10_final
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

echo "=== verify sf1: $(date -Is)"
java $JOPTS -cp "$CP" graft.Verify "$REPO/target/testdata-local/sf1" "$OUT/vout_sf1" \
  > "$OUT/verify_sf1.log" 2>&1
echo "=== verify sf1 done rc=$?: $(date -Is)"

echo "=== oracle sf1: $(date -Is)"
python3 tools/check_oracle.py --pyuf "$REPO/target/testdata-local/sf1" "$OUT/vout_sf1" \
  > "$OUT/oracle_sf1.log" 2>&1
echo "=== oracle sf1 done rc=$?: $(date -Is)"
echo "=== ALL DONE: $(date -Is)"
