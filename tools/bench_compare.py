#!/usr/bin/env python3
"""Compare two Bench JSON lines: per-query ratio, flag >1.3x disagreement."""
import json
import sys

a = json.loads(open(sys.argv[1]).read().strip().split("\n")[-1].lstrip("[info] "))
b = json.loads(open(sys.argv[2]).read().strip().split("\n")[-1].lstrip("[info] "))
qa, qb = a["queries"], b["queries"]
print(f"total A={a['value']:.1f}s  B={b['value']:.1f}s  "
      f"ratio={max(a['value'], b['value']) / min(a['value'], b['value']):.3f}  "
      f"queries={len(qa)}")
bad = []
for k in sorted(qa):
    if k not in qb:
        continue
    lo, hi = min(qa[k], qb[k]), max(qa[k], qb[k])
    r = hi / lo if lo > 0 else float("inf")
    if r > 1.3 and hi > 0.3:  # ignore sub-300ms jitter
        bad.append((r, k, qa[k], qb[k]))
for r, k, x, y in sorted(bad, reverse=True):
    print(f"  DISAGREE {k:28s} A={x:.2f} B={y:.2f} ratio={r:.2f}")
if not bad:
    print("  all per-query times agree within 1.3x (or are <300ms)")
print("top 12 by time (run B):")
for k, v in sorted(qb.items(), key=lambda kv: -kv[1])[:12]:
    print(f"  {k:28s} {v:.2f}s")
