#!/bin/bash
# Guard the README's measured-spec-count line against the actual suite
# total (round-7 lesson, recurred round 9). Usage:
#   sbt -batch test | tee /tmp/suite.log
#   tools/check_readme_counts.sh /tmp/suite.log
# Exit 0 iff README's "N tests" equals the log's "Tests: succeeded N".
set -euo pipefail
log="${1:?usage: check_readme_counts.sh <sbt-test-log>}"
repo="$(cd "$(dirname "$0")/.." && pwd)"

measured=$(grep -oE 'Tests: succeeded [0-9]+' "$log" | tail -1 | grep -oE '[0-9]+')
documented=$(grep -oE 'ScalaTest: [0-9]+ tests' "$repo/README.md" | grep -oE '[0-9]+')

if [[ -z "$measured" ]]; then
  echo "FAIL: no 'Tests: succeeded N' line in $log (did the suite run?)" >&2
  exit 2
fi
if [[ "$measured" != "$documented" ]]; then
  echo "FAIL: README documents $documented specs, suite measured $measured — reset the README number from the suite line" >&2
  exit 1
fi
# SURVEY's round-state line drifted 762 vs 764 in round 14 — guard it
# the same way (round-14 verdict #5). The line reads "spec suite N green".
survey=$(grep -oE 'spec suite [0-9]+ green' "$repo/SURVEY.md" | tail -1 | grep -oE '[0-9]+')
if [[ -n "$survey" && "$survey" != "$measured" ]]; then
  echo "FAIL: SURVEY.md round-state line documents $survey specs, suite measured $measured — reset it from the suite line" >&2
  exit 1
fi
echo "OK: README spec count ($documented) matches the measured suite total${survey:+; SURVEY state line agrees}"
