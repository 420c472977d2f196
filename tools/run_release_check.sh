#!/bin/bash
# One-command release gate (r13 verdict task 6): every proof the round
# rests on, one summary line per gate, artifact path on each line.
# Gates:
#   1. sbt test            — the spec suites (plan pins, bit-identity pins)
#   2. Verify @ sf0.01     — the driver-contract correctness dump
#   3. DuckDB oracle       — per-query compare over the dump (the gate)
#   4. Bench @ sf0.1       — the driver-contract timing JSON
# Scale legs (sf1/sf10full sweeps, per-query oracle at scale, probes) are
# separate scripts by design — they take hours and have their own logs;
# this gate is the "is HEAD shippable" answer in one invocation.
#
# Usage: tools/run_release_check.sh [outdir]   (default target/release_check)
set -u
cd /root/repo
OUT=${1:-target/release_check}
mkdir -p "$OUT"
SUMMARY="$OUT/summary.txt"
: > "$SUMMARY"
fail=0

note() { echo "$1" | tee -a "$SUMMARY"; }

# ---- gate 1: sbt test -------------------------------------------------
sbt -batch test > "$OUT/sbt_test.log" 2>&1
rc=$?
line=$(grep -E "Tests: succeeded" "$OUT/sbt_test.log" | tail -1)
if [ $rc -eq 0 ] && grep -q "All tests passed" "$OUT/sbt_test.log"; then
  note "GATE sbt-test: PASS ($line) [$OUT/sbt_test.log]"
else
  note "GATE sbt-test: FAIL rc=$rc ($line) [$OUT/sbt_test.log]"; fail=1
fi

# ---- gate 2: Verify dump at sf0.01 ------------------------------------
VOUT="$OUT/vout"
rm -rf "$VOUT"
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 $VOUT" \
  > "$OUT/verify.log" 2>&1
rc=$?
n=$(ls -d "$VOUT"/*/ 2>/dev/null | wc -l)
if [ $rc -eq 0 ] && [ "$n" -gt 0 ]; then
  note "GATE verify-dump: PASS ($n query dirs) [$OUT/verify.log]"
else
  note "GATE verify-dump: FAIL rc=$rc ($n query dirs) [$OUT/verify.log]"; fail=1
fi

# ---- gate 3: DuckDB oracle over the dump ------------------------------
python3 tools/check_oracle.py --pyuf /root/testdata/sf0.01 "$VOUT" \
  > "$OUT/oracle.log" 2>&1
rc=$?
tallies=$(tail -2 "$OUT/oracle.log" | grep -E "pass|fail" | tail -1)
if [ $rc -eq 0 ] && echo "$tallies" | grep -qE " 0 fail"; then
  note "GATE oracle: PASS ($tallies) [$OUT/oracle.log]"
else
  note "GATE oracle: FAIL rc=$rc ($tallies) [$OUT/oracle.log]"; fail=1
fi

# ---- gate 4: Bench at sf0.1 (driver contract line) --------------------
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" \
  > "$OUT/bench.log" 2>&1
rc=$?
json=$(grep -E '^\{"metric"' "$OUT/bench.log" | tail -1)
total=$(echo "$json" | python3 -c "import sys,json;print(json.load(sys.stdin)['value'])" 2>/dev/null)
if [ $rc -eq 0 ] && [ -n "$total" ]; then
  cp -f target/bench_last.json "$OUT/bench_sf0.1.json" 2>/dev/null
  note "GATE bench: PASS (${total}s sf0.1 suite) [$OUT/bench_sf0.1.json]"
else
  note "GATE bench: FAIL rc=$rc [$OUT/bench.log]"; fail=1
fi

if [ $fail -eq 0 ]; then note "RELEASE CHECK: ALL GATES GREEN"; else note "RELEASE CHECK: FAILED"; fi
exit $fail
