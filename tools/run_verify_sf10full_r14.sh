#!/bin/bash
# Round-14 sf10full correctness leg: Verify-dump all queries at the
# consistently-scaled second decade (500k docs / 200k vecs / 15M orders /
# 60M lineitems / 10M events) from frozen HEAD classes
# (target/r14_classes); the per-query DuckDB oracle sweep runs
# separately via tools/run_oracle_sfN.sh.
set -u
cd /root/repo
rm -rf target/r14_classes && cp -r target/scala-2.13/classes target/r14_classes
[ -f target/r14_classes/graft/Verify.class ] || { echo "freeze failed"; exit 1; }
JOPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx48g"
echo "=== verify sf10full (r14 HEAD): $(date -Is)"
java $JOPTS -cp "/opt/spark/jars/*:target/r14_classes" graft.Verify \
  target/testdata-local/sf10full target/vout_sf10full_r14
rc=$?
echo "=== verify sf10full done rc=$rc: $(date -Is)"
exit $rc
