#!/bin/bash
# Round-14 single-query bench legs from a FROZEN class dir (arg 3), so
# source edits mid-round never contaminate a "before" measurement.
# Usage: run_benchone_r14.sh <query> <sfdir> <classdir> <iters> <logfile> [workdir-tag]
set -u
cd /root/repo
Q=$1; SF=$(readlink -f "$2"); CLASSES=$3; ITERS=${4:-3}; LOG=$5; TAG=${6:-$Q}
JOPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx48g"
WORK=target/benchone_r14/$TAG
rm -rf "$WORK" && mkdir -p "$WORK"
( cd "$WORK" && java $JOPTS -cp "/opt/spark/jars/*:/root/repo/$CLASSES" \
    graft.BenchOne "$Q" "$SF" "$ITERS" 2>&1 | grep -E "^\[bench-one\]" ) >> "$LOG"
