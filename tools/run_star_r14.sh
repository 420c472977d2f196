#!/bin/bash
# Round-14 star third decade + skew legs (r13 verdict task 2), plus the
# m-family scale probe (task 5):
#   sf100star (mult 1000: 150M orders / 600M lineitems / 100M events) —
#     BenchOne for the reference-workload headliners q01/q02/q12/q25/e01
#   sf10skew  (mult 100, --skew: hot custkey = 20% of orders, hot user =
#     20% of events) — the same headliners under key skew
#   sf10full m-family BenchOne: m01/m02/m04 (the mapPartitions decode
#     path's only scale measurement)
set -u
cd /root/repo
L=target/star_r14.log
: > "$L"
CLS=${1:-target/scala-2.13/classes}
echo "=== star/skew legs from $CLS $(date -Is)" >> "$L"
for q in q01_top_abandoned_parts q02_co_abandoned_pairs q12_export_join q25_rolling_window e01_sessionize; do
  echo "--- sf100star $q $(date -Is)" >> "$L"
  tools/run_benchone_r14.sh "$q" target/testdata-local/sf100star "$CLS" 3 "$L" "star_$q"
done
for q in q01_top_abandoned_parts q02_co_abandoned_pairs q12_export_join q25_rolling_window e01_sessionize; do
  echo "--- sf10skew $q $(date -Is)" >> "$L"
  tools/run_benchone_r14.sh "$q" target/testdata-local/sf10skew "$CLS" 3 "$L" "skew_$q"
done
for q in m01_media_features m02_frame_sample m04_content_dedup; do
  echo "--- sf10full $q $(date -Is)" >> "$L"
  tools/run_benchone_r14.sh "$q" target/testdata-local/sf10full "$CLS" 3 "$L" "m_$q"
done
echo "=== star/skew legs done $(date -Is)" >> "$L"
