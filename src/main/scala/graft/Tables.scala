package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed loaders for the driver-provided testdata tables.
  *
  * `events` plays the observation stream of the reference
  * (services/ingest -> normalize -> persist): user_id ~ patientId,
  * event_type ~ LOINC-ish code, value ~ observation value, ts ~
  * effectiveDateTime, props ~ raw JSON payload. `customer` plays the
  * patient registry; `documents`/`embeddings` feed the LLM-pipeline
  * operators; TPC-H tables exercise the relational/scale paths.
  */
object Tables {
  /** Driver-regenerated parquet sometimes carries
    * isAdjustedToUTC=false on its timestamp columns, which Spark
    * surfaces as TIMESTAMP_NTZ (earlier drops were UTC-adjusted or
    * TIMESTAMP(NANOS)). Normalize every NTZ column to session-TZ
    * TIMESTAMP at load: the session is pinned UTC (Engine.configure),
    * so the cast is instant-preserving, and downstream plans, specs,
    * and the DuckDB-oracle dtypes stay stable across data refreshes. */
  private def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    raw.schema.fields.filter(_.dataType == TimestampNTZType).foldLeft(raw) {
      (df, f) => df.withColumn(f.name, col(f.name).cast(TimestampType))
    }
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader
    * rejects; with spark.sql.legacy.parquet.nanosAsLong (set in
    * Engine.configure) it arrives as raw nanos. Convert via integer
    * division (ns epoch values exceed 2^53 — double math would lose
    * precision) to a microsecond timestamp. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  val all: Seq[String] = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Name-keyed loader (same normalization as the typed loaders) —
    * for registering temp views / generic tooling. */
  def byName(s: SparkSession, d: String, name: String): DataFrame =
    if (name == "events") events(s, d) else load(s, d, name)

  /** Modification time of a table path for cache-staleness keys,
    * resolved through Hadoop's FileSystem so it works for every
    * supported scheme (s3a://, hdfs://, file:...) — java.io.File
    * .lastModified() silently returns 0 off the local filesystem,
    * which would quietly revert the stale-cache guard in exactly the
    * object-store deployments the 100 TB framing targets. A missing
    * path maps to -1 (distinct from any real mtime). */
  def mtime(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    try fs.getFileStatus(p).getModificationTime
    catch { case _: java.io.FileNotFoundException => -1L }
  }
}
