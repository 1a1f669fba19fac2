#!/usr/bin/env python3
"""Fold BENCH_LATEST per-query values into BENCH_BASELINE as minima.

Baseline semantics: the best (quietest-host) observed per-query time.
New queries enter at their observed value; existing entries only ever
decrease. The top-level `value` is recomputed as the sum of the map, so
the file stays internally consistent (round-6 ADVICE).

Since round 11 the file also carries `history`: the last N (8) per-query
HEADLINE values from folded benches, oldest first. Bench.scala reads it
to self-adjudicate receipts (verdict "weather" when a warm probe sits
inside the committed band / within 2x the historical median even though
it exceeds 2x the best-ever floor — the q85/d10 pattern that burned a
manual triage every round).

Round-12 hardening (both ADVICE lows):
 - a slot whose receipt verdict was "regressed" does NOT enter history:
   its headline carries the raw (regressed) bench value, and folding it
   would let a persistent regression self-exonerate as "weather" one
   round later (the adjudication-ratchet hole). The floor min-fold is
   unaffected — a genuinely regressed value never lowers a min.
 - folding is idempotent per bench artifact: each folded file's content
   hash is recorded under `folded_hashes` (bounded list); re-running the
   fold on the same BENCH_LATEST skips its history append (duplicate
   entries would skew the median/max band), while the min-fold is
   idempotent by construction.

Usage: tools/fold_baseline.py [extra.json ...]
  Folds BENCH_LATEST.json plus any extra bench-format files given.
"""
import hashlib
import json
import sys

HIST_N = 8
# r12 ADVICE: the idempotency guarantee is only as wide as this window —
# a hash evicted from it lets the same artifact double-append history on
# a re-fold. 512 is ~two orders of magnitude above any plausible
# per-round artifact count (a round folds a handful of benches) and
# costs ~8 KB of file, so the window can no longer be outlived in
# practice.
FOLDED_N = 512

base = json.load(open("BENCH_BASELINE.json"))
b = base["queries"]
hist = base.setdefault("history", {})
folded = base.setdefault("folded_hashes", [])
live = set()
for path in ["BENCH_LATEST.json"] + sys.argv[1:]:
    raw = open(path, "rb").read()
    lat = json.loads(raw)
    live |= set(lat["queries"])
    fh = hashlib.sha256(raw).hexdigest()[:16]
    already = fh in folded
    if already:
        print(f"{path}: already folded (hash {fh}) — skipping history append")
    else:
        folded.append(fh)
        del folded[:-FOLDED_N]
    for k, v in lat["queries"].items():
        receipt = lat.get("receipts", {}).get(k, {})
        # receipts carry the adjudicated warm-probe value; prefer it
        # (probe may legitimately be 0.0 — only None means absent)
        probe = receipt.get("probe")
        cand = min(v, probe) if probe is not None else v
        b[k] = min(b.get(k, cand), cand)
        # history records the headline value (already probe-adjusted
        # for noise/weather slots) — the band a quiet-vs-hot host
        # actually produces, which is what adjudication compares against.
        # "regressed" slots are excluded: their headline is the raw
        # regressed value, and appending it would pull the band up to
        # meet the regression.
        if not already and receipt.get("verdict") != "regressed":
            h = hist.setdefault(k, [])
            h.append(round(v, 3))
            del h[:-HIST_N]
# queries retired from the live suite would silently inflate the sum —
# report and prune them so `value` tracks the suite actually benched
stale = sorted(set(b) - live)
if stale:
    print(f"pruning stale baseline keys (not in any folded bench): {stale}")
    for k in stale:
        del b[k]
        hist.pop(k, None)
for k in sorted(set(hist) - set(b)):
    del hist[k]
base["value"] = sum(b.values())
base["queries"] = dict(sorted(b.items()))
base["history"] = dict(sorted(hist.items()))
json.dump(base, open("BENCH_BASELINE.json", "w"))
print(f"folded: {len(b)} queries, sum {base['value']:.1f}s, "
      f"history depth {max((len(v) for v in hist.values()), default=0)}")
