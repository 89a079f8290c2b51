#!/usr/bin/env python3
"""Render the round-11 campaign's per-leg Bench sidecar files
(/tmp/r11/<family>_<tag>.json, written via SPARK_GRAFT_BENCH_OUT — the
retired driver-side stdout scrape is not a consumer, SCALE.md §17.0) as
zipf-vs-uniform decade-factor tables for SCALE.md §17."""
import json, os, sys

R = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r11"
fam = sys.argv[2] if len(sys.argv) > 2 else "sig"
tags = ["uni01", "zipf01", "uni1", "zipf1", "uni10", "zipf10"]
runs = {}
for tag in tags:
    p = os.path.join(R, f"{fam}_{tag}.json")
    if os.path.exists(p):
        runs[tag] = json.load(open(p))["queries"]

qs = sorted({q for r in runs.values() for q in r})
def f(tag, q):
    v = runs.get(tag, {}).get(q)
    return f"{v:.2f}" if v is not None else "-"
def ratio(hi, lo, q):
    a, b = runs.get(hi, {}).get(q), runs.get(lo, {}).get(q)
    return f"{a/b:.1f}x" if a is not None and b else "-"

hdr = ["query", "uni 0.1", "uni 1", "uni 10", "u x(100x)",
       "zipf 0.1", "zipf 1", "zipf 10", "z x(100x)"]
print("| " + " | ".join(hdr) + " |")
print("|" + "---|" * len(hdr))
for q in qs:
    print("| " + " | ".join([q,
        f("uni01", q), f("uni1", q), f("uni10", q), ratio("uni10", "uni01", q),
        f("zipf01", q), f("zipf1", q), f("zipf10", q), ratio("zipf10", "zipf01", q)]) + " |")
