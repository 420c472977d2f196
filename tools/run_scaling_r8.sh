#!/bin/bash
# Round-8 full-suite scaling study (VERDICT r7 task 1): bench all queries
# at sf0.1-local (control) / sf1 / sf1skew, then oracle-check all queries
# at sf1 via DuckDB (--pyuf). Runs from a FROZEN copy of the compiled
# classes so development can continue in parallel; benches run first and
# back-to-back so they see an otherwise idle host.
set -u
cd /root/repo
OUT=target/scaling_r8
JOPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx16g"
CP="/opt/spark/jars/*:$OUT/classes"

for sf in sf0.1 sf1 sf1skew; do
  echo "=== bench $sf: $(date -Is)"
  SPARK_GRAFT_SF_DIR=target/testdata-local/$sf \
    java $JOPTS -cp "$CP" graft.Bench > "$OUT/bench_$sf.log" 2>&1
  rc=$?
  cp -f target/bench_last.json "$OUT/bench_$sf.json" 2>/dev/null
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
