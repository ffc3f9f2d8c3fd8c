#!/usr/bin/env bash
# Mechanical end-of-round artifact commit (verdict r16 item 1: the
# committed tree kept disagreeing with the driver's round record for
# three rounds running). Run as the LAST step of a round, after the
# bench/baseline/correctness refreshes:
#
#   tools/end_of_round.sh <round-number>
#
# Stages every round artifact that exists — the live records
# (BENCH_FULL, DUCKDB_BASELINE, LEAKCHECK, SCALE_PROBE, retention gate)
# plus the per-round driver outputs (BENCH_r<N>, CORRECTNESS_r<N>,
# VERDICT, ADVICE) — and commits them in ONE commit, so a judge never
# reads a tree whose committed bench disagrees with the round record.
set -euo pipefail
cd "$(dirname "$0")/.."
round="${1:?usage: tools/end_of_round.sh <round-number>}"

files=()
for f in BENCH_FULL.json DUCKDB_BASELINE.json LEAKCHECK.json \
         SCALE_PROBE.json CORRECTNESS_RETAIN.json \
         "BENCH_r${round}.json" "CORRECTNESS_r${round}.json" \
         VERDICT.md ADVICE.md; do
  [ -e "$f" ] && files+=("$f")
done

git add -- "${files[@]}"
if git diff --cached --quiet; then
  echo "end_of_round: all round artifacts already committed"
else
  git commit -m "round ${round}: commit round artifacts in one step"
  echo "end_of_round: committed ${files[*]}"
fi
