#!/bin/bash
# Round-15 interleaved A/B (r14 verdict task 2): the three sf10full
# sweep rows the r14 stall adjudication left unpinned — d07/d15/d16,
# sweep mins 2.4x their r13 values. Same discipline d05/d06/s01 got in
# PERF 14f.4c: HEAD classes vs r13 classes, alternating legs inside one
# host window so a stall hits both sides equally, min-of-3 per leg, two
# legs per side. HEAD legs additionally report executor CPU seconds
# (CpuMeter, r15) — the stall-immune number that settles the question
# even if a stall does land.
# Usage: run_ab_r15.sh <r13-classdir> <head-classdir> [logfile]
set -u
cd /root/repo
R13=${1:-target/r13tree/target/scala-2.13/classes}
HEAD=${2:-target/scala-2.13/classes}
LOG=${3:-target/ab_r15.log}
SF=target/testdata-local/sf10full
: > "$LOG"
echo "=== interleaved A/B d07/d15/d16 @ sf10full: r13=$R13 head=$HEAD $(date -Is)" >> "$LOG"
for q in d07_contamination d15_decontaminate_apply d16_containment_audit; do
  for leg in 1 2; do
    echo "--- $q leg $leg r13 $(date -Is) loadavg=$(cut -d' ' -f1-3 /proc/loadavg)" >> "$LOG"
    tools/run_benchone_r14.sh "$q" "$SF" "$R13" 3 "$LOG" "ab15_r13_$q"
    echo "--- $q leg $leg head $(date -Is) loadavg=$(cut -d' ' -f1-3 /proc/loadavg)" >> "$LOG"
    tools/run_benchone_r14.sh "$q" "$SF" "$HEAD" 3 "$LOG" "ab15_head_$q"
  done
done
echo "=== A/B done $(date -Is)" >> "$LOG"
