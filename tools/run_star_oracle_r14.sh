#!/bin/bash
# Round-14 star/skew oracle legs (r13 verdict task 2): Verify-dump the
# headliners at sf100star (150M orders / 600M lineitems / 100M events)
# and sf10skew, then per-query DuckDB compare via run_oracle_sfN.sh.
# The Verify leg runs with the big-corpus knobs (256 shuffle partitions,
# 512 MB dim-broadcast ceiling) — the same settings the BenchOne legs
# measured; result VALUES are knob-independent, which is exactly what
# the oracle proves.
set -u
cd /root/repo
JOPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx48g"
export SPARK_GRAFT_SHUFFLE_PARTITIONS=256
export SPARK_GRAFT_BROADCAST_THRESHOLD=536870912
QS="q01_top_abandoned_parts,q02_co_abandoned_pairs,q12_export_join,q25_rolling_window,e01_sessionize"
CLS=${1:-target/r14_star_classes}
for sf in sf100star sf10skew; do
  VOUT=target/vout_$sf
  rm -rf "$VOUT"
  echo "=== verify-dump $sf: $(date -Is)"
  java $JOPTS -cp "/opt/spark/jars/*:/root/repo/$CLS" graft.Verify \
    "target/testdata-local/$sf" "$VOUT" "$QS" \
    > "target/verify_${sf}_r14.log" 2>&1
  echo "=== verify-dump $sf done rc=$?: $(date -Is)"
  tools/run_oracle_sfN.sh "target/testdata-local/$sf" "$VOUT" \
    "target/oracle_${sf}_r14.txt"
done
echo "=== STAR ORACLE DONE: $(date -Is)"
