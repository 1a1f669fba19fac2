#!/usr/bin/env python3
"""Fold BENCH_LATEST per-query values into BENCH_BASELINE as minima.

Baseline semantics: the best (quietest-host) observed per-query time.
New queries enter at their observed value; existing entries only ever
decrease. The top-level `value` is recomputed as the sum of the map, so
the file stays internally consistent (round-6 ADVICE).

Usage: tools/fold_baseline.py [extra.json ...]
  Folds BENCH_LATEST.json plus any extra bench-format files given.
"""
import json
import sys

base = json.load(open("BENCH_BASELINE.json"))
b = base["queries"]
for path in ["BENCH_LATEST.json"] + sys.argv[1:]:
    lat = json.load(open(path))
    for k, v in lat["queries"].items():
        # receipts carry the adjudicated warm-probe value; prefer it
        probe = lat.get("receipts", {}).get(k, {}).get("probe")
        cand = min(v, probe) if probe else v
        b[k] = min(b.get(k, cand), cand)
base["value"] = sum(b.values())
base["queries"] = dict(sorted(b.items()))
json.dump(base, open("BENCH_BASELINE.json", "w"))
print(f"folded: {len(b)} queries, sum {base['value']:.1f}s")
