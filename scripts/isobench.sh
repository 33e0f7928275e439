#!/bin/bash
# Isolated-cold per-query bench: one fresh JVM per query, REPS=5,
# packaged jar via spark-submit (no sbt recompile between queries).
# Produces the BASELINE.md "isolated" medians for the warm-ordering-
# sensitive families, where full-registry medians are cache/ordering
# artifacts (the r10 verdict's ask #1). Run on a QUIET box; the canary
# reads inside each artifact record ambient load during the run.
#
# Usage: scripts/isobench.sh q1 q2 ...   (env: SF, OUT, REPS, MEM)
set -u
JAR=target/scala-2.13/etlhealthcarespark_2.13-0.1.0.jar
SF=${SF:-/root/testdata/sf0.1}
OUT=${OUT:-/tmp/iso_r11}
REPS=${REPS:-5}
MEM=${MEM:-24g}
mkdir -p "$OUT"
for q in "$@"; do
  echo "== $q =="
  SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_REPS=$REPS \
  SPARK_GRAFT_BENCH_ONLY=$q SPARK_GRAFT_BENCH_OUT=$OUT/$q.json \
  /opt/spark/bin/spark-submit --master 'local[32]' --driver-memory "$MEM" \
    --class graft.Bench "$JAR" 2>/dev/null | tail -1
done
