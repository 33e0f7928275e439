package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Shared observation-stream column derivations (events as the
  * reference's ingest stream). Kept as pure Column functions so every
  * operator stays inside whole-stage codegen. */
object Obs {
  /** Tenant of an event (reference: envelope.tenantId). */
  def tenant: Column = concat(lit("t"), pmod(col("user_id"), lit(4)))

  /** Ingest date partition value (reference: raw/<tenant>/<date>/). */
  def ingestDate: Column = date_format(col("ts"), "yyyy-MM-dd")

  /** Microsecond-precision canonical timestamp string — identical to
    * DuckDB strftime(ts, '%Y-%m-%d %H:%M:%S.%f'). */
  def tsCanon: Column = date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** Canonical value rendering: decimal(18,2) prints identically in
    * Spark and DuckDB (raw double-to-string does not: 1e7 formats
    * differently per engine). */
  def valueCanon: Column = col("value").cast(DecimalType(18, 2)).cast("string")

  /** Deliberate single-partition window key for ranking a BOUNDED set
    * (a TakeOrdered page, a metadata manifest): always 0, but NOT
    * foldable — a literal partition key is stripped by the optimizer
    * (EliminateWindowPartitions), reverting the window to
    * partition-less and re-triggering the "No Partition Defined"
    * warning this exists to retire. Evaluates per-row as pmod(hash, 1)
    * = 0; the input is bounded by construction wherever this is used,
    * so one partition is the design, not an accident. */
  def onePart(c: Column): Column = pmod(hash(c), lit(1))
}

/** Ingest/envelope semantics (reference: services/ingest/handler.ts).
  *
  * The reference wraps each raw payload in an `ingest.raw.v1` envelope
  * with tenantId, source, idempotencyKey (defaulting to the event id,
  * services/ingest/handler.ts:43) and a sha256 contentHash of the
  * serialized payload (handler.ts:25), then persists the raw copy
  * under raw/<tenant>/<date>/<id>.json for replay. Set-oriented, the
  * envelope is a pure projection (codegen'd, no shuffle); the
  * idempotency dedup is a first-writer-wins window on the key.
  */
object Ingest {

  /** A1 `ingest_envelope` — envelope wrap + content hash. The payload
    * canonical form is a '|'-joined field list; contentHash = sha256.
    * Pure narrow projection: at 100 TB this is a single codegen'd
    * scan-project stage, no shuffle. */
  def envelope(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(
      col("event_id"),
      Obs.tenant.as("tenant_id"),
      concat(lit("src"), pmod(col("event_id"), lit(3))).as("source"),
      concat(lit("evt-"), col("event_id")).as("idempotency_key"),
      sha2(concat_ws("|", col("event_id"), col("user_id"), col("event_type"),
        Obs.valueCanon, Obs.tsCanon), 256).as("content_hash"),
      concat(lit("raw/"), Obs.tenant, lit("/"), Obs.ingestDate, lit("/"),
        col("event_id"), lit(".json")).as("raw_key"))

  def envelopeSql: String =
    """SELECT event_id,
      |  't' || (user_id % 4) AS tenant_id,
      |  'src' || (event_id % 3) AS source,
      |  'evt-' || event_id AS idempotency_key,
      |  sha256(concat_ws('|', event_id, user_id, event_type,
      |    CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR),
      |    strftime(ts, '%Y-%m-%d %H:%M:%S.%f'))) AS content_hash,
      |  'raw/t' || (user_id % 4) || '/' || strftime(ts, '%Y-%m-%d') || '/'
      |    || event_id || '.json' AS raw_key
      |FROM events""".stripMargin

  /** A2 `ingest_dedup_idempotency` — first-writer-wins per
    * idempotency key (reference: persist condition
    * `idempotencyKey <> :idk` makes replays no-ops). The synthetic key
    * collides on purpose (event_id mod 400) so dedup has work to do.
    * One shuffle on the key; row_number then filter rn=1. */
  def dedupIdempotency(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("idempotency_key"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("idempotency_key", concat(lit("k"), pmod(col("event_id"), lit(400))))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("idempotency_key"), col("event_id").as("first_event_id"),
        col("ts").as("first_ts"), col("user_id"), col("event_type"))
  }

  def dedupIdempotencySql: String =
    """SELECT idempotency_key, event_id AS first_event_id,
      |  CAST(ts AS TIMESTAMP) AS first_ts, user_id, event_type
      |FROM (
      |  SELECT *, 'k' || (event_id % 400) AS idempotency_key,
      |    ROW_NUMBER() OVER (PARTITION BY 'k' || (event_id % 400)
      |                       ORDER BY ts, event_id) AS rn
      |  FROM events
      |) WHERE rn = 1""".stripMargin

  /** A3 `ingest_partition_keys` — raw-store partition layout
    * (tenant/date) as derived partition columns + per-partition
    * volume. At scale these are the physical partitionBy columns of
    * the raw zone (see Audit.partitionedWrite spec). */
  def partitionKeys(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(Obs.tenant.as("tenant_id"), Obs.ingestDate.as("ingest_date"))
      .agg(count(lit(1)).as("n_objects"),
        Analytics.dsum(col("value")).as("total_value"))

  def partitionKeysSql: String =
    """SELECT 't' || (user_id % 4) AS tenant_id,
      |  strftime(ts, '%Y-%m-%d') AS ingest_date,
      |  COUNT(*) AS n_objects,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ingest_envelope" -> (envelope _),
    "ingest_dedup_idempotency" -> (dedupIdempotency _),
    "ingest_partition_keys" -> (partitionKeys _))

  val oracles: Map[String, String] = Map(
    "ingest_envelope" -> envelopeSql,
    "ingest_dedup_idempotency" -> dedupIdempotencySql,
    "ingest_partition_keys" -> partitionKeysSql)
}
