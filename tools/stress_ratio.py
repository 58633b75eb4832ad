#!/usr/bin/env python3
"""Compare two Bench JSON lines (full runs, same CPU count) and print
per-query time ratios sorted descending — the SURVEY §5 stress evidence.

Usage: python3 tools/stress_ratio.py base.txt stress.txt [topN]
Each file holds one Bench stdout line (optionally [info]-prefixed).
Uses min-of-passes (the "queries" map); also prints both raw passes for
the topN so one-time fit costs (pass-1) are visible next to steady state.
"""
import json
import re
import sys


def load(path):
    with open(path) as f:
        line = f.read()
    m = re.search(r'\{"metric".*\}', line)
    return json.loads(m.group(0))


base, stress = load(sys.argv[1]), load(sys.argv[2])
top = int(sys.argv[3]) if len(sys.argv) > 3 else 20

rows = []
for q, b in base["queries"].items():
    s = stress["queries"].get(q)
    if s is None or b <= 0 or s <= 0:
        continue
    rows.append((s / b, q, b, s, stress.get("passes", {}).get(q)))
rows.sort(reverse=True)

bt = sum(v for v in base["queries"].values() if v > 0)
st = sum(v for v in stress["queries"].values() if v > 0)
print(f"total: base {bt:.1f}s stress {st:.1f}s ratio {st / bt:.2f}x "
      f"({len(rows)} queries)")
print(f"{'ratio':>7}  {'query':<28} {'base_s':>8} {'stress_s':>9}  passes")
for r, q, b, s, p in rows[:top]:
    print(f"{r:7.2f}  {q:<28} {b:8.3f} {s:9.3f}  {p}")
