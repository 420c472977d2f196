#!/usr/bin/env python3
"""Render the PERF.md TWO-DECADE scaling table from three Bench JSON lines
(sf0.1-local control, sf1, sf10): per-query growth across each decade,
flagging any super-linear row (>10x growth at 10x data). A -1 time means
the query REFUSED the corpus (the declared quadratic-baseline caps at
sf10) — rendered as "refused", excluded from growth math.

Usage: scaling_table_r11.py bench_sf0.1.json bench_sf1.json bench_sf10.json
"""
import json, sys

b01, b1, b10 = (json.load(open(f)) for f in sys.argv[1:4])
q01, q1, q10 = b01["queries"], b1["queries"], b10["queries"]

def fmt(t):
    return "refused" if t is not None and t < 0 else (t if t is not None else "-")

rows, flagged = [], []
for name in sorted(q1):
    t0, t1, t10 = q01.get(name), q1.get(name), q10.get(name)
    ok = lambda t: t is not None and t >= 0
    g1 = (t1 / t0) if ok(t0) and ok(t1) and t0 > 0.005 else None   # sub-5ms base: noise
    g10 = (t10 / t1) if ok(t1) and ok(t10) and t1 > 0.005 else None
    rows.append((name, t0, t1, t10, g1, g10))
    if g10 is not None and g10 > 10:
        flagged.append((name, f"super-linear second decade: {g10:.1f}x at 10x data"))
    elif g1 is not None and g1 > 10:
        flagged.append((name, f"super-linear first decade: {g1:.1f}x at 10x data"))

print("| query | sf0.1-local (s) | sf1 (s) | growth d1 | sf10 (s) | growth d2 |")
print("|---|---|---|---|---|---|")
for name, t0, t1, t10, g1, g10 in rows:
    print(f"| {name} | {fmt(t0)} | {fmt(t1)} | "
          f"{f'{g1:.1f}x' if g1 else 'n/a'} | {fmt(t10)} | "
          f"{f'{g10:.1f}x' if g10 else ('refused' if t10 is not None and t10 < 0 else 'n/a')} |")
print(f"\ntotals: sf0.1 {b01['value']}s, sf1 {b1['value']}s "
      f"({b1['value']/b01['value']:.1f}x), sf10 {b10['value']}s "
      f"({b10['value']/b1['value']:.2f}x of sf1; refused rows excluded)")
if flagged:
    print("\nFLAGGED:")
    for name, why in flagged:
        print(f"  {name}: {why}")
else:
    print("\nno super-linear rows")
