"""Diff two xprof hlo_stats dumps by framework-op family.

Usage: python experiments/r4_hlo_diff.py A.json B.json [itersA] [itersB]
Groups each row by a normalized framework-op key (layer indices stripped) and
prints families sorted by (B - A) self time — names what one variant adds.
"""
import json
import re
import sys
from collections import defaultdict


def load(path, iters):
    d = json.load(open(path))
    cols = [c.get("label", c.get("id")) for c in d["cols"]]
    ix = {c: i for i, c in enumerate(cols)}
    agg = defaultdict(float)
    for r in d["rows"]:
        st = (r["c"][ix["Total self time (us)"]] or {}).get("v") or 0.0
        fw = (r["c"][ix["Framework op name"]] or {}).get("v") or ""
        cat = (r["c"][ix["HLO op category"]] or {}).get("v") or "?"
        hlo = (r["c"][ix["HLO op name"]] or {}).get("v") or "?"
        key = fw or (cat + ":" + re.sub(r"[.\d]+$", "", hlo))
        key = re.sub(r"layers_\d+", "layers_N", key)
        key = re.sub(r"\.\d+", "", key)
        key = re.sub(r"_\d+/", "_N/", key)
        agg[key] += st / iters / 1e3
    return agg


a = load(sys.argv[1], float(sys.argv[3]) if len(sys.argv) > 3 else 5.0)
b = load(sys.argv[2], float(sys.argv[4]) if len(sys.argv) > 4 else 5.0)
keys = set(a) | set(b)
rows = sorted(keys, key=lambda k: -(b.get(k, 0.0) - a.get(k, 0.0)))
print(f"total A={sum(a.values()):.2f} ms  B={sum(b.values()):.2f} ms  "
      f"delta={sum(b.values())-sum(a.values()):+.2f} ms")
print(f"{'delta':>8} {'A':>8} {'B':>8}  key")
for k in rows:
    da, db = a.get(k, 0.0), b.get(k, 0.0)
    if abs(db - da) < 0.05:
        continue
    print(f"{db-da:+8.3f} {da:8.3f} {db:8.3f}  {k[:120]}")
