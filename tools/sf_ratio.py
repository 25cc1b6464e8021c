#!/usr/bin/env python3
"""Superlinearity audit (r4 verdict directive 3): compare a Bench JSON at
sf1 (10x data) against the mean of two sf0.1 runs from the same quiet
window. Data grew exactly 10x (bench/ScaleData.scala replicates with
key-shifting so join fan-outs and group cardinalities scale linearly), so
any query whose wall grew > FLAG_RATIO is flagged for a plan audit.

Usage: sf_ratio.py <bench_sf01_a.json> <bench_sf01_b.json> <bench_sf1.json>
"""
import json, sys

FLAG_RATIO = 12.0   # >~1.2x the 10x data ratio
MIN_BASE_S = 0.15   # below this, sf0.1 wall is constant-dominated; use floor

a, b, big = (json.load(open(p)) for p in sys.argv[1:4])
qa, qb, qs = a["queries"], b["queries"], big["queries"]
rows = []
for name in sorted(qs):
    if name not in qa or name not in qb:
        # a missing baseline entry would silently halve/zero the base and
        # fabricate a superlinearity flag — surface the mismatch instead
        sys.exit(f"ERROR: {name} missing from a baseline file; "
                 "re-run both sf0.1 benches at the same bits")
    base = (qa[name] + qb[name]) / 2
    eff_base = max(base, MIN_BASE_S)
    ratio = qs[name] / eff_base
    rows.append((ratio, name, base, qs[name]))
rows.sort(reverse=True)
flagged = [r for r in rows if r[0] > FLAG_RATIO]
print(f"total sf0.1 (mean of 2): {(a['value']+b['value'])/2:.1f}s   "
      f"total sf1: {big['value']:.1f}s   ratio {big['value']/((a['value']+b['value'])/2):.2f}x on 10x data")
print(f"flagged >{FLAG_RATIO}x: {len(flagged)}")
print(f"{'query':8} {'sf0.1':>8} {'sf1':>8} {'ratio':>7}")
for ratio, name, base, sf1 in rows[:25]:
    mark = " <-- FLAG" if ratio > FLAG_RATIO else ""
    print(f"{name:8} {base:8.2f} {sf1:8.2f} {ratio:6.1f}x{mark}")
