#!/usr/bin/env python3
"""Fork-vs-fork co-isolated trend table between two bench artifacts.

Round-16 verdict task 6: trend isolated numbers INSIDE fork mode only.
Compares the `isolated` (fresh-JVM warm) maps of two bench_r*_local.json
artifacts over their common query set, prints a per-family table plus
the movers beyond a threshold, and the overall median ratio.

Usage: python3 tools/trend_fork.py bench_r16_local.json bench_r17_local.json [thresh]
"""
import json, re, statistics, sys

old_p, new_p = sys.argv[1], sys.argv[2]
thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
old, new = json.load(open(old_p)), json.load(open(new_p))
o, n = old["isolated"], new["isolated"]
common = sorted(set(o) & set(n))
ratios = {q: n[q] / o[q] for q in common if o[q] > 0}

fam = lambda q: re.match(r"[a-z]+", q).group(0)
fams = {}
for q, r in ratios.items():
    fams.setdefault(fam(q), []).append(r)

print(f"common isolated queries: {len(common)} "
      f"(old-only: {sorted(set(o)-set(n))}, new-only: {sorted(set(n)-set(o))})")
print(f"overall median ratio (new/old, fork-warm): "
      f"{statistics.median(ratios.values()):.3f}")
print(f"ext_cores old/new: {old.get('ext_cores')}/{new.get('ext_cores')}  "
      f"isolated_ext old/new: {old.get('ext_cores_isolated')}/{new.get('ext_cores_isolated')}")
print("\nfamily  n  median  min   max")
for f in sorted(fams):
    rs = fams[f]
    print(f"{f:>6} {len(rs):>3} {statistics.median(rs):>6.3f} "
          f"{min(rs):>5.2f} {max(rs):>5.2f}")
print(f"\nmovers (> {thresh}x or < {1/thresh:.2f}x):")
for q in sorted(ratios, key=lambda q: -ratios[q]):
    r = ratios[q]
    if r > thresh or r < 1 / thresh:
        print(f"  {q:<42} {o[q]:>7.2f} -> {n[q]:>7.2f}  ({r:.2f}x)")
