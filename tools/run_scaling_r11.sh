#!/bin/bash
# Round-11 scaling study: the first leg BEYOND the reference's own scale.
# Bench all queries at sf0.1-local (control) / sf1 (like-for-like vs the
# r10 sweep) / sf10 (500k docs, 200k vectors, 1.5M orders / 6M lineitems —
# ~8x the reference's 16M-cart fact-row count when counting lineitems),
# then verify + oracle-check at sf10 for every query except the three
# declared quadratic baselines (d02/d05/d06), which REFUSE over-cap
# corpora by design — the bench legs record the refusal as a -1 row,
# which is the guard working, not a failure.
#
# Inherits the r10 sweep hygiene: frozen classes so development can
# continue in parallel; abort if the freeze failed; every leg in its OWN
# working directory so the official target/bench_last.json of a
# concurrent driver bench can never be touched; literal grep on the
# sf-field before copying an artifact.
set -u
cd /root/repo
REPO=$PWD
OUT=$REPO/target/scaling_r11_final
mkdir -p "$OUT"
if [ ! -d "$OUT/classes" ]; then
  cp -r target/scala-2.13/classes "$OUT/classes"
fi
[ -f "$OUT/classes/graft/Bench.class" ] || { echo "freeze failed: no compiled classes"; exit 1; }
JOPTS="--add-opens java.base/java.lang=ALL-UNNAMED --add-opens java.base/java.lang.invoke=ALL-UNNAMED --add-opens java.base/java.lang.reflect=ALL-UNNAMED --add-opens java.base/java.io=ALL-UNNAMED --add-opens java.base/java.net=ALL-UNNAMED --add-opens java.base/java.nio=ALL-UNNAMED --add-opens java.base/java.util=ALL-UNNAMED --add-opens java.base/java.util.concurrent=ALL-UNNAMED --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx24g"
CP="/opt/spark/jars/*:$OUT/classes"

for sf in sf0.1 sf1 sf10; do
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

# sf10 correctness: dump every query (the refused baselines log their
# refusal to stderr and leave no output; --only keeps the oracle off
# their quadratic SQL)
ONLY="q,e,m,p,t,s,d01,d03,d04,d07,d08,d09,d10,d11,d12,d13,d14,d15,d16,d17"
echo "=== verify sf10: $(date -Is)"
( cd "$OUT" && java $JOPTS -cp "$CP" graft.Verify \
    "$REPO/target/testdata-local/sf10" "$OUT/vout_sf10" "$ONLY" \
    > "$OUT/verify_sf10.log" 2>&1 )
echo "=== verify sf10 done rc=$?: $(date -Is)"

echo "=== oracle sf10: $(date -Is)"
python3 tools/check_oracle.py --pyuf "--only=$ONLY" \
  "$REPO/target/testdata-local/sf10" "$OUT/vout_sf10" \
  > "$OUT/oracle_sf10.log" 2>&1
echo "=== oracle sf10 done rc=$?: $(date -Is)"
echo "=== ALL DONE: $(date -Is)"
