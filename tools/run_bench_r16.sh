#!/bin/bash
# Round-16 scaling bench: like-for-like with the r15 sweep (same consume
# harness, same corpora: sf0.1 / sf1 / sf10full), from a frozen class
# dir, each leg in its own working dir. Round-over-round comparisons use
# the per-query cpu_s columns against bench/scaling_r15/ (PERF 15g — the
# declared CPU baseline); wall stays what a user experiences.
# NEW in r16 (r15 verdict task 7): a q12@sf100star DEFAULT-knob BenchOne
# leg, so the no-fact-shuffle property is regression-guarded by a NUMBER
# (wall+cpu+digest) every round, not only by PlanSpec shape pins.
set -u -o pipefail
cd /root/repo
REPO=$PWD
OUT=$REPO/target/bench_r16
mkdir -p "$OUT"
rm -rf "$OUT/classes"; cp -r target/scala-2.13/classes "$OUT/classes"
[ -f "$OUT/classes/graft/Bench.class" ] || { echo "freeze failed"; exit 1; }
JOPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx48g"
CP="/opt/spark/jars/*:$OUT/classes"
for sf in sf0.1 sf1 sf10full; do
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
# --- q12 @ sf100star, DEFAULT knobs (the scheduled no-fact-shuffle guard)
STARDIR=$REPO/target/testdata-local/sf100star
if [ -f "$STARDIR/lineitem.parquet" ]; then
  echo "=== star q12 leg: $(date -Is)"
  LEGDIR=$OUT/leg_star_q12
  rm -rf "$LEGDIR" && mkdir -p "$LEGDIR"
  ( cd "$LEGDIR" && env -u SPARK_GRAFT_SHUFFLE_PARTITIONS -u SPARK_GRAFT_BROADCAST_THRESHOLD \
      java $JOPTS -cp "$CP" graft.BenchOne q12_export_join "$STARDIR" 2 2>&1 \
      | grep -E "^\[bench-one\]" > "$OUT/star_q12.log" )
  rc=$?
  echo "=== star q12 done rc=$rc: $(date -Is)"
else
  echo "=== star q12 leg SKIPPED (no $STARDIR corpus — tools/gen_star_big.py)"
fi
echo "=== BENCH SWEEP DONE: $(date -Is)"
