#!/bin/bash
# Round-9 full-suite scaling study (VERDICT r8 task 1): bench all queries
# at sf0.1-local (control) / sf1 / sf1skew, then oracle-check all queries
# at sf1 via DuckDB (--pyuf). Runs from a FROZEN copy of the compiled
# classes so development can continue in parallel; benches run first and
# back-to-back so they see an otherwise idle host.
#
# Fixes vs run_scaling_r8.sh (ADVICE r8):
#  - creates $OUT and freezes target/classes itself (reproducible one-shot)
#  - clears target/bench_last.json before each leg and only copies it on
#    rc=0 AND an embedded-"sf" match, so a crashed leg can never mislabel
#    the previous leg's JSON as its own official artifact
set -u
cd /root/repo
OUT=target/scaling_r9
mkdir -p "$OUT"
if [ ! -d "$OUT/classes" ]; then
  cp -r target/scala-2.13/classes "$OUT/classes"
fi
JOPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx16g"
CP="/opt/spark/jars/*:$OUT/classes"

for sf in sf0.1 sf1 sf1skew; do
  echo "=== bench $sf: $(date -Is)"
  rm -f target/bench_last.json
  SPARK_GRAFT_SF_DIR=target/testdata-local/$sf \
    java $JOPTS -cp "$CP" graft.Bench > "$OUT/bench_$sf.log" 2>&1
  rc=$?
  if [ $rc -eq 0 ] && grep -q "\"sf\":\"target/testdata-local/$sf\"" target/bench_last.json 2>/dev/null; then
    cp -f target/bench_last.json "$OUT/bench_$sf.json"
  else
    echo "=== bench $sf: NOT copying artifact (rc=$rc or sf-field mismatch)"
  fi
  echo "=== bench $sf done rc=$rc: $(date -Is)"
done

echo "=== verify sf1: $(date -Is)"
java $JOPTS -cp "$CP" graft.Verify target/testdata-local/sf1 "$OUT/vout_sf1" \
  > "$OUT/verify_sf1.log" 2>&1
echo "=== verify sf1 done rc=$?: $(date -Is)"

echo "=== oracle sf1: $(date -Is)"
python3 tools/check_oracle.py --pyuf target/testdata-local/sf1 "$OUT/vout_sf1" \
  > "$OUT/oracle_sf1.log" 2>&1
echo "=== oracle sf1 done rc=$?: $(date -Is)"
echo "=== ALL DONE: $(date -Is)"
