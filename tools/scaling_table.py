#!/usr/bin/env python3
"""Render the PERF.md full-suite scaling table from three Bench JSON lines
(sf0.1-local control, sf1, sf1skew): per-query growth at 10x data and the
skew delta, flagging any super-linear row (growth > 10x) and any skew row
outside 2x of its un-skewed sf1 time.

Usage: scaling_table.py bench_sf0.1.json bench_sf1.json bench_sf1skew.json
"""
import json, sys

b01, b1, bsk = (json.load(open(f)) for f in sys.argv[1:4])
q01, q1, qsk = b01["queries"], b1["queries"], bsk["queries"]

rows, flagged = [], []
for name in sorted(q1):
    t0, t1, ts = q01.get(name), q1[name], qsk.get(name)
    growth = (t1 / t0) if t0 and t0 > 0.005 else None   # sub-5ms base: noise
    skewx = (ts / t1) if ts is not None and t1 > 0.005 else None
    rows.append((name, t0, t1, ts, growth, skewx))
    if growth is not None and growth > 10:
        flagged.append((name, f"super-linear: {growth:.1f}x at 10x data"))
    if skewx is not None and skewx > 2:
        flagged.append((name, f"skew-sensitive: {skewx:.1f}x under 90/20% hot keys"))

print("| query | sf0.1-local (s) | sf1 (s) | growth at 10x | sf1skew (s) | skew delta |")
print("|---|---|---|---|---|---|")
for name, t0, t1, ts, g, s in rows:
    print(f"| {name} | {t0 if t0 is not None else '-'} | {t1} | "
          f"{f'{g:.1f}x' if g else 'n/a (sub-5ms)'} | {ts if ts is not None else '-'} | "
          f"{f'{s:.2f}x' if s else 'n/a'} |")
print(f"\ntotals: sf0.1 {b01['value']}s, sf1 {b1['value']}s "
      f"({b1['value']/b01['value']:.1f}x), sf1skew {bsk['value']}s "
      f"({bsk['value']/b1['value']:.2f}x of sf1)")
if flagged:
    print("\nFLAGGED:")
    for name, why in flagged:
        print(f"  {name}: {why}")
else:
    print("\nno super-linear rows, no skew-sensitive rows")
