#!/usr/bin/env python3
"""Paired A/B report over scripts/ab_bench.sh output: min-of-3 per
(version, query) plus the per-rep spread, so a real regression (stable
ratio across interleaved pairs) separates from host noise (ratio
swinging with the rep). Usage: ab_report.py [/tmp/ab]"""
import json
import sys
from pathlib import Path

out = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/ab")
runs = {}
for ver in ("r8", "cur"):
    runs[ver] = []
    for rep in (1, 2, 3):
        p = out / f"{ver}_{rep}.json"
        runs[ver].append(json.loads(p.read_text())["queries"])

queries = sorted(runs["r8"][0].keys(), key=lambda q: int(q[1:].split("_")[0]))
print(f"{'query':8} {'r8 min':>8} {'cur min':>8} {'ratio':>6}   r8 reps | cur reps")
tot8 = totc = 0.0
rows = []
for q in queries:
    v8 = [r[q] for r in runs["r8"]]
    vc = [r[q] for r in runs["cur"]]
    m8, mc = min(v8), min(vc)
    tot8 += m8
    totc += mc
    rows.append((q, m8, mc))
    print(f"{q:8} {m8:8.3f} {mc:8.3f} {mc/m8:6.2f}   "
          f"{'/'.join(f'{x:.2f}' for x in v8)} | {'/'.join(f'{x:.2f}' for x in vc)}")
print(f"{'TOTAL':8} {tot8:8.3f} {totc:8.3f} {totc/tot8:6.2f}")
print(json.dumps({"ab": [{"query": q, "r8_min": m8, "cur_min": mc,
                          "ratio": round(mc / m8, 3)} for q, m8, mc in rows],
                  "total_r8": round(tot8, 3), "total_cur": round(totc, 3)}))
