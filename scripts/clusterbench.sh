#!/bin/bash
# Cluster bench (the r11 verdict's ask #1): the full registry under
# local-cluster[2,8,4096] — the correctness gate's config — so
# serialization, real network shuffle I/O, and executor-memory
# pressure show up in a PERF artifact for the first time (every prior
# frozen number is local[32], where all three are invisible).
#
# Same Bench main and median-of-REPS protocol as the local bench; the
# canary inside the artifact records ambient load. Run on a QUIET box.
#
# Usage: scripts/clusterbench.sh        (env: SF, OUT, REPS)
set -u
JAR=target/scala-2.13/etlhealthcarespark_2.13-0.1.0.jar
SF=${SF:-/root/testdata/sf0.1}
OUT=${OUT:-BENCH_CLUSTER_r12.json}
REPS=${REPS:-3}
# 2 executors x 8 cores: shuffle.partitions = 16 (2-3x total cores is
# the cluster guidance; AQE coalesces down)
SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=16 SPARK_GRAFT_BENCH_REPS=$REPS \
SPARK_GRAFT_MASTER='local-cluster[2,8,4096]' SPARK_GRAFT_BENCH_OUT=$OUT \
/opt/spark/bin/spark-submit --master 'local-cluster[2,8,4096]' \
  --driver-memory 16g \
  --class graft.Bench "$JAR" 2>/dev/null | tail -1
