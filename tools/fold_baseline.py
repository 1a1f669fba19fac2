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
live = set()
for path in ["BENCH_LATEST.json"] + sys.argv[1:]:
    lat = json.load(open(path))
    live |= set(lat["queries"])
    for k, v in lat["queries"].items():
        # receipts carry the adjudicated warm-probe value; prefer it
        # (probe may legitimately be 0.0 — only None means absent)
        probe = lat.get("receipts", {}).get(k, {}).get("probe")
        cand = min(v, probe) if probe is not None else v
        b[k] = min(b.get(k, cand), cand)
# queries retired from the live suite would silently inflate the sum —
# report and prune them so `value` tracks the suite actually benched
stale = sorted(set(b) - live)
if stale:
    print(f"pruning stale baseline keys (not in any folded bench): {stale}")
    for k in stale:
        del b[k]
base["value"] = sum(b.values())
base["queries"] = dict(sorted(b.items()))
json.dump(base, open("BENCH_BASELINE.json", "w"))
print(f"folded: {len(b)} queries, sum {base['value']:.1f}s")
