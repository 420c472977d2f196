#!/bin/bash
# Round-12 sf10full correctness leg: Verify-dump all queries at the
# CONSISTENTLY-scaled sf10full corpus (500k docs / 200k vecs / 15M orders /
# 60M lineitems / 10M events — r11 verdict task 3: one corpus where every
# family's input grew 10x vs sf1). Frozen classes; the DuckDB oracle pass
# runs separately (tools/run_oracle_sf10full_r12.sh).
set -u
cd /root/repo
JOPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx48g"
echo "=== verify sf10full: $(date -Is)"
java $JOPTS -cp "/opt/spark/jars/*:target/r12_classes" graft.Verify \
  target/testdata-local/sf10full target/vout_sf10full
rc=$?
echo "=== verify sf10full done rc=$rc: $(date -Is)"
