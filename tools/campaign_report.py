#!/usr/bin/env python3
"""Render /tmp/campaign_skew.jsonl (tagged Bench lines) as a
zipf-vs-uniform decade-factor table for SCALE.md §16.

Tags `fix_<tag>` overlay their query timings onto `<tag>`: the round-8
collapse fix re-measured only the three changed queries on the five
datasets already covered by the pre-fix sweep (the other 13 queries'
code paths are identical between the two commits)."""
import json, sys, re

path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/campaign_skew.jsonl"
runs = {}
for line in open(path):
    line = line.strip()
    if not line:
        continue
    m = re.match(r'\{"tag":"([^"]+)"\}\s*(?:\[info\]\s*)?(\{.*\})', line)
    if not m:
        continue
    tag, payload = m.group(1), json.loads(m.group(2))
    runs.setdefault(tag, {}).update(payload["queries"])
for tag in [t for t in runs if t.startswith("fix_")]:
    runs.setdefault(tag[4:], {}).update(runs.pop(tag))

qs = sorted({q for r in runs.values() for q in r})
def f(tag, q):
    v = runs.get(tag, {}).get(q)
    return f"{v:.2f}" if v is not None else "-"
def ratio(tag_hi, tag_lo, q):
    hi, lo = runs.get(tag_hi, {}).get(q), runs.get(tag_lo, {}).get(q)
    if hi is None or lo is None or lo == 0:
        return "-"
    return f"{hi/lo:.1f}x"

hdr = ["query", "uni 0.1", "uni 1", "uni 10", "u x(100x)",
       "zipf 0.1", "zipf 1", "zipf 10", "z x(100x)"]
print("| " + " | ".join(hdr) + " |")
print("|" + "---|" * len(hdr))
for q in qs:
    print("| " + " | ".join([q,
        f("uni01", q), f("uni1", q), f("uni10", q), ratio("uni10", "uni01", q),
        f("zipf01", q), f("zipf1", q), f("zipf10", q), ratio("zipf10", "zipf01", q)]) + " |")
