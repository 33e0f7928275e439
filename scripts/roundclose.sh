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
  # sanity BEFORE the copy: the source must parse, AND its canary
  # series must be flat. r13 closed on an artifact whose canary spiked
  # 6.5x (ambient co-tenant load) — 15 rows read >2x baseline purely
  # from load, and the snapshot adopted it silently (r13 verdict ask
  # #2). A spiky-canary run is INVALID for adoption, full stop: re-run
  # in a quiet window (or isobench the flagged rows) instead.
  # Override only with ROUNDCLOSE_FORCE=1, which tags nothing — don't.
  python3 - BENCH_FULL.json <<'EOF'
import json, os, sys
with open(sys.argv[1]) as f:
    d = json.load(f)
assert "queries" in d and len(d["queries"]) > 0, "no per-query data"
def spike(series, name, limit=2.0):
    vals = sorted(v for v in series if v > 0)
    if len(vals) < 3:
        return None
    med = vals[len(vals) // 2]
    mx = vals[-1]
    if med > 0 and mx / med > limit:
        return f"{name} max/median {mx / med:.1f} (max {mx:.3f}s, median {med:.3f}s)"
    return None
bad = [m for m in (spike(d.get("canary", []), "canary"),
                   spike(d.get("canary_cpu", []), "canary_cpu"))
       if m]
if bad and os.environ.get("ROUNDCLOSE_FORCE") != "1":
    sys.exit("REFUSING adoption — loaded bench run: " + "; ".join(bad) +
             ". Re-run the bench in a quiet window (the canary series "
             "must be flat, max/median <= 2).")
print(f"bench clean: {len(d['queries'])} queries, "
      f"total {d.get('value', '?')} {d.get('unit', '')}")
EOF
  cp BENCH_FULL.json "BENCH_${RN}_full.json"
  echo "adopted BENCH_${RN}_full.json"
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
