package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The house lineage-cut seam (the r12 verdict's ask #5).
  *
  * Every iterative operator (Graph's per-round frontiers, Dedup's
  * candidate-pair table, Bucketing's stats store, the frozen ANN index
  * artifacts) cuts lineage with `localCheckpoint()` — eager, cheap,
  * and fine single-JVM, but the blocks live on EXECUTORS: at 1000
  * executors with dynamic allocation a decommissioned executor takes
  * its blocks with it, and a truncated-lineage RDD cannot be
  * recomputed — lost blocks are a job failure, not a slowdown.
  *
  * `cut` is the conf-gated switch between the two checkpoint classes:
  *
  *   - `graft.checkpoint.dir` unset (default) → `localCheckpoint()`:
  *     the right call for local[*] runs, tests, and benches (no HDFS
  *     round-trip).
  *   - `graft.checkpoint.dir=<fault-tolerant path>` → RELIABLE
  *     `checkpoint()` into that directory (HDFS/object store): blocks
  *     survive executor loss, which is the only correct mode for a
  *     long-lived 1000-executor deployment.
  *
  * Both are EAGER, both yield a LogicalRDD leaf (so
  * `Graph.releaseCheckpoint`'s leaf-unpersist discipline works
  * unchanged), and results are bit-identical — CheckpointSpec pins
  * result equality on both paths. The hot-seam memo registries
  * (Graph.memoCheckpoint, Dedup.clusterCache, Similarity.refreshReg,
  * Bucketing.statsStoreReg) include [[mode]] in their key token so a
  * mid-session conf flip rebuilds instead of serving the other mode's
  * blocks; the remaining per-op registries serve correct DATA either
  * way (a flip there only changes which resilience class the cached
  * artifact was built under, healed at the next mtime change).
  * Reliable-mode files are reclaimed by Spark's context
  * cleaner (`spark.cleaner.referenceTracking.cleanCheckpoints=true`)
  * or by the deployment's directory lifecycle policy.
  */
object Ckpt {
  /** "" for executor-local blocks, else the reliable checkpoint dir. */
  def mode(spark: SparkSession): String =
    spark.conf.get("graft.checkpoint.dir", "")

  /** Last dir applied per session — setCheckpointDir creates an HDFS
    * round-trip + a fresh UUID subdir, so only (re)apply on change. */
  private val applied =
    new java.util.concurrent.ConcurrentHashMap[Integer, String]()

  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val dir = mode(spark)
    if (dir.isEmpty) df.localCheckpoint()
    else {
      val id = Integer.valueOf(System.identityHashCode(spark))
      // set-then-record, atomically per session: recording BEFORE the
      // set would make a failed setCheckpointDir (bad/unwritable path)
      // or a first-use race surface later as the opaque "checkpoint
      // directory has not been set" instead of the root cause
      applied.compute(id, (_, prev) => {
        if (!dir.equals(prev)) spark.sparkContext.setCheckpointDir(dir)
        dir
      })
      df.checkpoint()
    }
  }

  /** `df.cutLineage()` — drop-in syntax for the old `.localCheckpoint()`
    * call sites. */
  implicit class CutOps(private val df: DataFrame) extends AnyVal {
    def cutLineage(): DataFrame = Ckpt.cut(df)
  }
}
