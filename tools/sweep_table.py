#!/usr/bin/env python3
"""Render SCALE.md's per-query sf0.1-vs-sf1 sweep table from two bench.json
files (the full per-query maps Bench writes via SPARK_GRAFT_BENCH_OUT)."""
import json
import sys

a, b = (json.load(open(p)) for p in sys.argv[1:3])
qa, qb = a["queries"], b["queries"]
names = sorted(set(qa) & set(qb))
missing = sorted(set(qa) ^ set(qb))
if missing:
    print(f"<!-- only in one run: {missing} -->")
print("| query | sf0.1 s | sf1 s | ×10-data ratio |")
print("|---|---|---|---|")
worst = []
for n in names:
    x, y = float(qa[n]), float(qb[n])
    r = y / x if x > 0 else float("inf")
    worst.append((r, n))
    print(f"| {n} | {x:.2f} | {y:.2f} | {r:.1f}× |")
worst.sort(reverse=True)
ta, tb = sum(map(float, qa.values())), sum(map(float, qb.values()))
print(f"\n<!-- totals: sf0.1 {ta:.1f}s sf1 {tb:.1f}s ratio {tb/ta:.2f}; "
      f"top ratios: {[(n, round(r,1)) for r, n in worst[:5]]}; "
      f">4x: {sum(1 for r,_ in worst if r > 4)}; >10x: {sum(1 for r,_ in worst if r > 10)} -->")
