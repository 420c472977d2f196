#!/bin/bash
# Supplementary r11 leg: the STAR second decade. target/testdata-local's
# sfN convention scales star tables by 10N (sf1 = 1.5M orders), so the
# r11 sf10 leg's star tables matched sf1 and only documents/embeddings
# scaled; this leg benches sf10star (star_mult=100: 15M orders / 60M
# lineitems / 10M events ~ the reference's 16M-cart scale, with sf0.1's
# tiny doc tables so the doc families don't dominate the runtime).
set -u
cd /root/repo
REPO=$PWD
OUT=$REPO/target/star_r11
mkdir -p "$OUT"
rm -rf "$OUT/classes"; cp -r target/scala-2.13/classes "$OUT/classes"
[ -f "$OUT/classes/graft/Bench.class" ] || { echo "freeze failed"; exit 1; }
JOPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx24g"
CP="/opt/spark/jars/*:$OUT/classes"
LEGDIR=$OUT/leg_sf10star
rm -rf "$LEGDIR" && mkdir -p "$LEGDIR"
echo "=== bench sf10star: $(date -Is)"
( cd "$LEGDIR" && SPARK_GRAFT_SF_DIR=$REPO/target/testdata-local/sf10star \
    java $JOPTS -cp "$CP" graft.Bench > "$OUT/bench_sf10star.log" 2>&1 )
rc=$?
if [ $rc -eq 0 ] && grep -qF "\"sf\":\"$REPO/target/testdata-local/sf10star\"" "$LEGDIR/target/bench_last.json" 2>/dev/null; then
  cp -f "$LEGDIR/target/bench_last.json" "$OUT/bench_sf10star.json"
fi
echo "=== bench sf10star done rc=$rc: $(date -Is)"
