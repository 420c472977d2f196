#!/bin/bash
# Round-13 sf10full correctness leg: Verify-dump all queries at the
# consistently-scaled second decade (500k docs / 200k vecs / 15M orders /
# 60M lineitems / 10M events). Frozen classes (target/r13_classes); the
# per-query DuckDB oracle sweep runs separately via tools/run_oracle_sfN.sh.
set -u
cd /root/repo
JOPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx48g"
echo "=== verify sf10full: $(date -Is)"
java $JOPTS -cp "/opt/spark/jars/*:target/r13_classes" graft.Verify \
  target/testdata-local/sf10full target/vout_sf10full
rc=$?
echo "=== verify sf10full done rc=$rc: $(date -Is)"
