#!/usr/bin/env bash
# Prove a query's output is invariant to parallelism: run graft.Verify for
# the given queries at SPARK_GRAFT_CPUS=4/8/32 and byte-compare the parquet
# row payloads (via a duckdb canonical CSV dump, so file-level metadata
# like created_by timestamps can't cause false diffs).
#
# Any double sum/avg whose accumulation order isn't fixed is run-order
# nondeterministic (CLAUDE.md invariants) — this script is the cheap,
# permanent proof every float-touching query must pass before commit.
#
# Usage: tools/cpus_invariance.sh [sfdir] query [query...]
#        tools/cpus_invariance.sh /root/testdata/sf0.01 q41_window_frames
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:?usage: cpus_invariance.sh sfdir query...}"; shift
QUERIES=("$@")
[ ${#QUERIES[@]} -gt 0 ] || { echo "need at least one query name"; exit 2; }

WORK=$(mktemp -d /tmp/cpusinv.XXXXXX)
trap 'rm -rf "$WORK"' EXIT

for CPUS in 4 8 32; do
  echo "=== SPARK_GRAFT_CPUS=$CPUS ==="
  # Capture to a log and test sbt's own exit status FIRST: a compile
  # error or OOM-killed JVM prints no "[verify] ... failed" line, and a
  # grep-only check would sail on to a confusing duckdb missing-parquet
  # error (round-4 ADVICE). Then surface per-query failures, which Verify
  # reports as "[verify] <name> failed: ..." and keeps going.
  LOG="$WORK/verify.c$CPUS.log"
  if ! SPARK_GRAFT_CPUS=$CPUS sbt -batch \
       "runMain graft.Verify $SF_DIR $WORK/c$CPUS ${QUERIES[*]}" >"$LOG" 2>&1; then
    echo "sbt/Verify exited non-zero at CPUS=$CPUS — log tail:"
    tail -n 25 "$LOG"
    exit 1
  fi
  if grep -E "\[verify\].*failed|^\[error\] Exception" "$LOG"; then
    echo "Verify reported failures at CPUS=$CPUS (above) — aborting"
    exit 1
  fi
done

FAIL=0
for Q in "${QUERIES[@]}"; do
  for CPUS in 4 8 32; do
    python3 - "$WORK/c$CPUS/$Q" "$WORK/$Q.$CPUS.csv" <<'EOF'
import sys, duckdb
src, dst = sys.argv[1], sys.argv[2]
con = duckdb.connect()
con.execute(f"COPY (SELECT * FROM read_parquet('{src}/*.parquet')) TO '{dst}' (FORMAT CSV)")
EOF
  done
  if cmp -s "$WORK/$Q.4.csv" "$WORK/$Q.8.csv" && cmp -s "$WORK/$Q.4.csv" "$WORK/$Q.32.csv"; then
    echo "INVARIANT $Q (byte-identical across CPUS=4/8/32)"
  else
    echo "VARIES    $Q  <-- run-order nondeterminism, fix before commit"
    FAIL=1
  fi
done
exit $FAIL
