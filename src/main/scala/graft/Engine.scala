package graft

import org.apache.spark.sql.SparkSession

/** Session factory tuned for the graft engine.
  *
  * Scale notes (100 TB / 1000-executor design, tested on local[32]):
  *   - AQE on: runtime coalescing + skew-join splitting.
  *   - shuffle.partitions sized to cores locally; on a real cluster this
  *     is 2-3x total executor cores (AQE coalesces down).
  *   - ANSI off: permissive casts (malformed -> null) match ETL
  *     drop-and-count semantics (reference: libs/validation/dto.ts drops
  *     invalid rows instead of failing the batch).
  *   - Session TZ UTC so timestamp semantics match the oracle.
  */
object Engine {
  /** Builder with every conf baked in at construction time. Setting
    * them only post-hoc via spark.conf.set is NOT enough: parallel
    * planning/schema-inference threads read a thread-local SQLConf
    * that may miss late runtime sets (seen as nondeterministic
    * PARQUET_TYPE_ILLEGAL on the nanos-timestamped events table). */
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // testdata timestamps may arrive as µs isAdjustedToUTC=false;
      // with NTZ inference OFF the scan reads them directly as
      // session-TZ TIMESTAMP (UTC session → instant-preserving), so ts
      // predicates push into the parquet scan and row-group stats
      // still prune. Tables.load's per-column NTZ cast stays as a
      // belt-and-braces fallback for externally built sessions, but a
      // Cast-wrapped column defeats pushdown — this conf is the real
      // path.
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      // per-process dir: the in-memory catalog forgets tables between
      // JVMs but their directories would survive, and saveAsTable
      // refuses to reuse an existing location
      .config("spark.sql.warehouse.dir",
        s"${System.getProperty("java.io.tmpdir")}/graft-warehouse-${ProcessHandle.current().pid()}")

  def session(appName: String = "graft", cores: String = "*"): SparkSession = {
    val spark = builder(s"local[$cores]",
      Runtime.getRuntime.availableProcessors()).appName(appName).getOrCreate()
    configure(spark)
    spark
  }

  /** Conf gate for the documented O(n²) correctness baselines (H2
    * `sim_cosine_pairs`, G3 `dedup_ngram_jaccard`). They exist to
    * ground-truth the LSH/IVF scale paths and die at 100× data, so a
    * cluster deployment sets `graft.allowQuadraticBaselines=false`
    * and anything that would plan all-pairs fails fast instead.
    * Default true so local oracles and specs run unchanged (same
    * pattern as Dedup's `graft.dedup.clusters.driverMaxEdges`). */
  def requireQuadraticAllowed(spark: SparkSession, op: String): Unit =
    if (!spark.conf.get("graft.allowQuadraticBaselines", "true").toBoolean)
      throw new IllegalStateException(
        s"$op is an O(n^2) correctness baseline and " +
          "graft.allowQuadraticBaselines=false — run the bucketed scale " +
          "path (MinHash/LSH or IVF) instead")

  /** Runtime confs safe to (re)apply on an externally created session. */
  def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    // events.parquet stores ts as TIMESTAMP(NANOS) which the vectorized
    // reader rejects; read as raw nanos and convert in Tables.events.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // keep ts predicates pushdown-able on NTZ-written data (see builder)
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // dims (region/nation/customer/supplier/part at dim scale) broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
