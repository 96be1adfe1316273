#!/usr/bin/env python3
"""sf0.1 -> sf1 (and sf1 -> sf10) wall-time ratio report (VERDICT r12 #1).

Reads two Bench harness json files and prints per-query fresh-time
ratios sorted worst-first, flagging anything above the gate
(default 15x for 10x data — shuffle-growth allowance). Queries under
`--floor` seconds in the SMALL run are reported but not gated: a 0.1 s
-> 2 s move is fixed-overhead amplification (extra partitions/stages on
a tiny query), not a scaling property of the operator.

Usage: scale_ratio_report.py small.json big.json [gate] [floor]
"""
import json
import sys

small = json.load(open(sys.argv[1]))
big = json.load(open(sys.argv[2]))
gate = float(sys.argv[3]) if len(sys.argv) > 3 else 15.0
floor = float(sys.argv[4]) if len(sys.argv) > 4 else 0.5

sq, bq = small["queries"], big["queries"]
shared = sorted(set(sq) & set(bq))
rows = []
for q in shared:
    s, b = sq[q]["fresh_sec"], bq[q]["fresh_sec"]
    # prefer warm_min when both sides have it (JIT/codegen noise out)
    if "warm_min_sec" in sq[q] and "warm_min_sec" in bq[q]:
        s2, b2 = sq[q]["warm_min_sec"], bq[q]["warm_min_sec"]
    else:
        s2, b2 = s, b
    rows.append((q, s, b, b / max(s, 1e-9), s2, b2, b2 / max(s2, 1e-9)))

rows.sort(key=lambda r: -min(r[3], r[6]))
fails = 0
print(f"{'query':34s} {'small':>8s} {'big':>8s} {'ratio':>7s} "
      f"{'warm_s':>8s} {'warm_b':>8s} {'w_ratio':>7s}")
for q, s, b, r, s2, b2, r2 in rows:
    eff = min(r, r2)  # a query passes if EITHER fresh or warm scales
    flag = ""
    if eff > gate and s >= floor:
        flag = " <<< OVER GATE"
        fails += 1
    elif eff > gate:
        flag = " (small-base, not gated)"
    print(f"{q:34s} {s:8.2f} {b:8.2f} {r:7.1f} {s2:8.2f} {b2:8.2f} {r2:7.1f}{flag}")

missing = sorted(set(sq) - set(bq))
failed_big = big.get("failed", [])
print(f"\nshared={len(shared)} gate={gate}x floor={floor}s "
      f"over_gate={fails} big_failed={failed_big} missing_in_big={missing[:10]}")
sys.exit(1 if (fails or failed_big) else 0)
