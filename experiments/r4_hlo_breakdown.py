"""Aggregate an xprof hlo_stats dump (r3_prof_eval.py output) by source line.

Usage: python experiments/r4_hlo_breakdown.py [/tmp/eval_hlo_stats.json] [iters]
Prints per-iteration self-time grouped by (a) repo source line, (b) HLO op
category, and the top-40 individual ops with their attribution — the tool the
round-3e "unattributed loop fusions/copies 7.1 ms" bucket was missing.
"""
import json
import re
import sys
from collections import defaultdict

path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/eval_hlo_stats.json"
iters = float(sys.argv[2]) if len(sys.argv) > 2 else 5.0

d = json.load(open(path))
cols = [c.get("label", c.get("id")) for c in d["cols"]]
ix = {c: i for i, c in enumerate(cols)}


def val(row, label):
    v = row["c"][ix[label]]
    return None if v is None else v.get("v")


def repo_frames(src_html):
    if not src_html:
        return []
    m = re.search(r"title='([^']*)'", src_html)
    if not m:
        return []
    return [
        ln for ln in m.group(1).split("\n")
        if ln.startswith("/root/repo/") and "bench.py" not in ln
        and "__graft_entry__" not in ln and "experiments/" not in ln
    ]


by_src = defaultdict(float)
by_cat = defaultdict(float)
rows = []
total = 0.0
for r in d["rows"]:
    st = val(r, "Total self time (us)") or 0.0
    st /= iters
    total += st
    cat = val(r, "HLO op category") or "?"
    by_cat[cat] += st
    frames = repo_frames(val(r, "Source Info"))
    key = frames[0] if frames else "(unattributed) " + (val(r, "Framework op name") or "?")[:80]
    by_src[key] += st
    rows.append((st, val(r, "HLO op name"), cat,
                 val(r, "Framework op name"), frames[:2],
                 val(r, "Bound by"), val(r, "%time stalled by DMA"),
                 val(r, "Measured memory BW (GiB/s)")))

print(f"total self time/iter: {total/1e3:.2f} ms\n")
print("== by HLO category ==")
for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1])[:20]:
    print(f"  {v/1e3:8.3f} ms  {k}")
print("\n== by repo source line (top 40) ==")
for k, v in sorted(by_src.items(), key=lambda kv: -kv[1])[:40]:
    print(f"  {v/1e3:8.3f} ms  {k}")
print("\n== top 45 individual ops ==")
rows.sort(key=lambda t: -t[0])
for st, name, cat, fw, frames, bound, dma, bw in rows[:45]:
    print(f"  {st/1e3:7.3f} ms  {cat:28s} {name:22s} bound={bound} dma%={dma and round(dma)} bw={bw and round(bw)}")
    print(f"            fw={str(fw)[:110]}")
    for f in frames:
        print(f"            {f}")
