#!/bin/bash
# Round-close artifact adoption (the r11 verdict's ask #2).
#
# The driver writes BENCH_r{N}.json / CORRECTNESS_r{N}.json AFTER the
# round's final commit, so every judge has found a dirty tree, and the
# driver's BENCH_r{N}.json is a truncated stdout tail ("parsed": null)
# that no tooling can read. This script makes adoption mechanical:
#
#   scripts/roundclose.sh <N>     # e.g. scripts/roundclose.sh 12
#
# 1. copies BENCH_FULL.json -> BENCH_r{N}_full.json so the round's
#    per-query medians survive in a PARSEABLE committed artifact even
#    if the driver's own BENCH_r{N}.json is a stub;
# 2. git-adds every driver artifact for the round (bench, correctness,
#    leakcheck, copycheck) plus the post-close BENCH_FULL/LEAKCHECK
#    rewrites;
# 3. commits if anything staged.
#
# Run it at round OPEN for the previous round (adopting the driver's
# post-close writes) and at round CLOSE for the current one.
set -eu
N=${1:?usage: scripts/roundclose.sh <round-number>}
RN=$(printf 'r%02d' "$N")

if [ -f BENCH_FULL.json ] && [ ! -f "BENCH_${RN}_full.json" ]; then
  cp BENCH_FULL.json "BENCH_${RN}_full.json"
  # sanity: the copy must parse — a truncated source is an error here,
  # not something to silently adopt
  python3 - "BENCH_${RN}_full.json" <<'EOF'
import json, sys
with open(sys.argv[1]) as f:
    d = json.load(f)
assert "queries" in d and len(d["queries"]) > 0, "no per-query data"
print(f"adopted {sys.argv[1]}: {len(d['queries'])} queries, "
      f"total {d.get('value', '?')} {d.get('unit', '')}")
EOF
fi

# one guarded add per artifact: `git add` with multiple pathspecs
# fatals (and stages NOTHING) when any listed file is absent, and
# several of these only exist in some rounds — a single-shot add
# behind 2>/dev/null silently no-oped (the r12 advisor catch)
for f in "BENCH_${RN}.json" "BENCH_${RN}_full.json" \
  "CORRECTNESS_${RN}.json" "CORRECTNESS_CLUSTER_${RN}.json" \
  "CORRECTNESS_SCALE_sf1_${RN}.json" "CORRECTNESS_SCALE_sf10_${RN}.json" \
  BENCH_FULL.json LEAKCHECK.json COPYCHECK.json PROGRESS.jsonl; do
  if [ -e "$f" ]; then git add -- "$f"; fi   # if-form: set -e safe
done

if ! git diff --cached --quiet; then
  git commit -m "round $N artifact adoption: bench + correctness + leakcheck"
else
  echo "nothing to adopt (tree already clean for round $N artifacts)"
fi
