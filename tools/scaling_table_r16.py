#!/usr/bin/env python3
"""r16 sweep vs the r15 CPU baseline (PERF 15g): per-leg totals plus the
per-query CPU deltas that moved more than a threshold, so the PERF entry
quotes CPU (host-stall-immune) instead of wall adjudications.

Usage: scaling_table_r16.py [r16dir] [r15dir]
"""
import json
import sys

r16 = sys.argv[1] if len(sys.argv) > 1 else "target/bench_r16"
r15 = sys.argv[2] if len(sys.argv) > 2 else "bench/scaling_r15"


def load(d, sf):
    with open(f"{d}/bench_sf{sf}.json") as f:
        return json.load(f)


for sf in ["0.1", "1", "10full"]:
    a, b = load(r15, sf), load(r16, sf)
    print(f"\n=== sf{sf}: wall {a['value']:.1f} -> {b['value']:.1f} s, "
          f"cpu {a['cpu_value']:.1f} -> {b['cpu_value']:.1f} s")
    rows = []
    for q in sorted(a["queries"]):
        ca, cb = a["cpu_s"].get(q, -1.0), b["cpu_s"].get(q, -1.0)
        wa, wb = a["queries"].get(q, -1.0), b["queries"].get(q, -1.0)
        if ca < 0 or cb < 0:
            if (ca < 0) != (cb < 0):
                rows.append((q, ca, cb, wa, wb, "CAP/ERR CHANGED"))
            continue
        # flag movers: >2x in either direction and >1 CPU-s absolute
        if max(ca, cb) > 1.0 and (cb > 2 * ca or ca > 2 * cb):
            rows.append((q, ca, cb, wa, wb, "faster" if cb < ca else "SLOWER"))
    for q, ca, cb, wa, wb, tag in sorted(rows, key=lambda r: -(r[1] - r[2])):
        print(f"  {q.split('_')[0]:4s} cpu {ca:8.1f} -> {cb:8.1f}  "
              f"(wall {wa:7.2f} -> {wb:7.2f})  {tag}")
