#!/usr/bin/env python3
"""Paired A/B report over scripts/ab_bench.sh output: min-of-3 per
(version, query) plus the per-rep spread, so a real regression (stable
ratio across interleaved pairs) separates from host noise (ratio
swinging with the rep). Sides are the generic "a"/"b" labels
ab_bench.sh writes (a = baseline ref, b = candidate).
Usage: ab_report.py [/tmp/ab]"""
import json
import sys
from pathlib import Path

out = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/ab")
runs = {}
for ver in ("a", "b"):
    runs[ver] = []
    for rep in (1, 2, 3):
        p = out / f"{ver}_{rep}.json"
        runs[ver].append(json.loads(p.read_text())["queries"])

queries = sorted(runs["a"][0].keys(), key=lambda q: int(q[1:].split("_")[0]))
print(f"{'query':8} {'a min':>8} {'b min':>8} {'ratio':>6}   a reps | b reps")
tota = totb = 0.0
rows = []
for q in queries:
    va = [r[q] for r in runs["a"]]
    vb = [r[q] for r in runs["b"]]
    ma, mb = min(va), min(vb)
    tota += ma
    totb += mb
    rows.append((q, ma, mb))
    print(f"{q:8} {ma:8.3f} {mb:8.3f} {mb/ma:6.2f}   "
          f"{'/'.join(f'{x:.2f}' for x in va)} | {'/'.join(f'{x:.2f}' for x in vb)}")
print(f"{'TOTAL':8} {tota:8.3f} {totb:8.3f} {totb/tota:6.2f}")
print(json.dumps({"ab": [{"query": q, "a_min": ma, "b_min": mb,
                          "ratio": round(mb / ma, 3)} for q, ma, mb in rows],
                  "total_a": round(tota, 3), "total_b": round(totb, 3)}))
