package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Query-API semantics of the reference re-expressed set-oriented
  * (reference: services/api-query/src/handler.ts + schema.graphql).
  *
  * `events` plays the observation stream: user_id ~ patientId,
  * event_type ~ code, ts ~ effectiveDateTime; `customer` plays the
  * patient registry.
  *
  * Scale notes: every per-patient query is a partition-pruned range
  * scan in spirit — the predicates (user, code, time range) push into
  * the parquet scan so a 100 TB store reads only matching row groups;
  * at cluster scale the store would be partitioned/bucketed by
  * (tenant, patient) making these true point scans. The latest-per-key
  * query shuffles once on the grouping key.
  */
object QueryApi {

  /** E1 `api_get_patient` — getPatient(id): point lookup in the
    * registry (reference handler does a DynamoDB GetItem on
    * PK=TENANT#t, SK=ENTITY#patient#id). */
  def getPatient(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_custkey") === 42)
      .select(col("c_custkey").as("patient_id"), col("c_name").as("name"),
        col("c_nationkey").as("nation_id"), col("c_acctbal").as("balance"),
        col("c_mktsegment").as("segment"))

  val getPatientSql: String =
    """SELECT c_custkey AS patient_id, c_name AS name,
      |  c_nationkey AS nation_id, c_acctbal AS balance,
      |  c_mktsegment AS segment
      |FROM customer WHERE c_custkey = 42""".stripMargin

  /** E2 `api_obs_by_patient` — observationsByPatient(patientId, code,
    * from, to, limit): ascending time-range scan with code filter
    * (reference: services/api-query/src/handler.ts:64-86 —
    * ScanIndexForward ascending, Limit clamped to 100). LIMIT is
    * ordered by the unique (ts, event_id) chain so the page is
    * deterministic (reference pages on the GSI2 sort key). */
  def obsByPatient(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(col("user_id") === 13 && col("event_type") === "purchase" &&
        col("ts") >= lit("2024-01-05 00:00:00").cast("timestamp") &&
        col("ts") < lit("2024-01-25 00:00:00").cast("timestamp"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"), col("value"))
      .orderBy(col("ts"), col("event_id"))
      .limit(50)

  val obsByPatientSql: String =
    """SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value
      |FROM events
      |WHERE user_id = 13 AND event_type = 'purchase'
      |  AND ts >= TIMESTAMP '2024-01-05 00:00:00'
      |  AND ts <  TIMESTAMP '2024-01-25 00:00:00'
      |ORDER BY ts, event_id
      |LIMIT 50""".stripMargin

  /** E3 `api_latest_observation` — latestObservation(patient, code)
    * for every (patient, code) at once: the reference scans the GSI
    * descending and takes the first row; set-oriented that is a
    * row_number window over (ts, event_id) descending. One shuffle on
    * the entity key. */
  def latestObservation(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"), col("value"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  val latestObservationSql: String =
    """SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value
      |FROM (
      |  SELECT event_id, user_id, event_type, ts, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
      |                       ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events
      |) WHERE rn = 1""".stripMargin

  /** E4 `api_obs_page_after` — keyset pagination: the page after
    * cursor (ts0, id0) for one patient, strictly ordered by the
    * unique (ts, event_id) chain. Equivalent of the reference's
    * nextToken continuation. */
  def obsPageAfter(spark: SparkSession, dir: String): DataFrame = {
    val ts0 = lit("2024-01-10 00:00:00").cast("timestamp")
    val id0 = lit(0L)
    Tables.events(spark, dir)
      .filter(col("user_id") === 13 &&
        (col("ts") > ts0 || (col("ts") === ts0 && col("event_id") > id0)))
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"), col("value"))
      .orderBy(col("ts"), col("event_id"))
      .limit(20)
  }

  val obsPageAfterSql: String =
    """SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value
      |FROM events
      |WHERE user_id = 13
      |  AND (ts > TIMESTAMP '2024-01-10 00:00:00'
      |       OR (ts = TIMESTAMP '2024-01-10 00:00:00' AND event_id > 0))
      |ORDER BY ts, event_id
      |LIMIT 20""".stripMargin

  /** E5 `api_obs_asof_join` — as-of join: for every probe event (a
    * purchase), the latest prior-or-equal observation (a click) of
    * the same patient. Spark lacks a built-in as-of join, so it is a
    * first-class custom logical operator here:
    * [[graft.plans.AsOfJoin]], expanded during analysis by the
    * injected [[graft.plans.ResolveAsOfJoin]] rule into the
    * union + last(struct, ignoreNulls) window plan — ONE shuffle on
    * user_id, no range-join pair explosion (a naive ts-range join is
    * O(probes x obs) per user). The expansion is ordinary Catalyst
    * operators, so the optimizer and codegen treat it like any
    * hand-written query. */
  def obsAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    graft.plans.AsOf.join(
      probe = ev.filter(col("event_type") === "purchase"),
      obs = ev.filter(col("event_type") === "click"),
      key = "user_id", ts = "ts", id = "event_id", value = "value")
  }

  val obsAsofJoinSql: String =
    """WITH tagged AS (
      |  SELECT user_id, ts, event_id, value, 0 AS is_probe
      |  FROM events WHERE event_type = 'click'
      |  UNION ALL
      |  SELECT user_id, ts, event_id, NULL AS value, 1 AS is_probe
      |  FROM events WHERE event_type = 'purchase'
      |), carried AS (
      |  SELECT *,
      |    last_value(CASE WHEN is_probe = 0 THEN event_id END IGNORE NULLS)
      |      OVER w AS obs_event_id,
      |    last_value(CASE WHEN is_probe = 0 THEN ts END IGNORE NULLS)
      |      OVER w AS obs_ts,
      |    last_value(CASE WHEN is_probe = 0 THEN value END IGNORE NULLS)
      |      OVER w AS obs_value
      |  FROM tagged
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, is_probe, event_id
      |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |)
      |SELECT event_id AS probe_id, user_id, CAST(ts AS TIMESTAMP) AS probe_ts,
      |  obs_event_id, CAST(obs_ts AS TIMESTAMP) AS obs_ts, obs_value
      |FROM carried WHERE is_probe = 1""".stripMargin

  /** E6 `api_limit_clamp` — the reference's page-size contract
    * (services/api-query/src/handler.ts:84): effective limit =
    * `Math.min(100, Math.max(1, Number(limit || 25)))`, where `||`
    * makes BOTH null and 0 fall back to the default 25 (JS falsy) and
    * negatives clamp up to 1. Modeled set-oriented: a tiny inline
    * request table (one row per limit edge case) non-equi-joined to
    * the patient's ordered scan — each request returns exactly its
    * clamped page. The request side is bounded by contract (a page of
    * API calls), so the nested-loop broadcast join is scale-safe. */
  def limitClamp(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val reqs = Seq(
      ("r_null", Option.empty[Int]), ("r_zero", Option(0)),
      ("r_neg", Option(-5)), ("r_mid", Option(17)), ("r_cap", Option(250)))
      .toDF("request_id", "req_limit")
    val eff = least(lit(100),
      greatest(lit(1), coalesce(nullif(col("req_limit"), lit(0)), lit(25))))
    // the clamp cap (100) bounds every page, so take the top-100 with
    // a distributed TakeOrdered FIRST; the partition-less row_number
    // window then only ever sees <= 100 rows, never the full scan
    val w = Window.orderBy(col("ts"), col("event_id"))
    val page = Tables.events(spark, dir)
      .filter(col("user_id") === 13)
      .select(col("event_id"), col("ts"), col("value"))
      .orderBy(col("ts"), col("event_id")).limit(100)
      .withColumn("rn", row_number().over(w))
    reqs.withColumn("eff_limit", eff)
      .join(page, col("rn") <= col("eff_limit"))
      .select(col("request_id"), col("eff_limit"), col("rn"),
        col("event_id"), col("ts"), col("value"))
  }

  val limitClampSql: String =
    """WITH reqs(request_id, req_limit) AS (
      |  VALUES ('r_null', CAST(NULL AS INTEGER)), ('r_zero', 0),
      |         ('r_neg', -5), ('r_mid', 17), ('r_cap', 250)
      |), page AS (
      |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, value,
      |    CAST(ROW_NUMBER() OVER (ORDER BY ts, event_id) AS INTEGER) AS rn
      |  FROM events WHERE user_id = 13
      |)
      |SELECT request_id,
      |  LEAST(100, GREATEST(1, COALESCE(NULLIF(req_limit, 0), 25))) AS eff_limit,
      |  rn, event_id, ts, value
      |FROM reqs JOIN page
      |  ON rn <= LEAST(100, GREATEST(1, COALESCE(NULLIF(req_limit, 0), 25)))""".stripMargin

  /** E7 `api_next_token` — the reference's pagination token contract
    * (services/api-query/src/handler.ts:85,106): the page's last
    * evaluated key is serialized to JSON, base64-encoded into
    * `nextToken`, and a follow-up request decodes it back into the
    * exclusive-start cursor. Modeled end-to-end: page 1 (limit 20) →
    * token = base64({"ts":...,"id":...}) of its last row → decode +
    * JSON-parse the token → keyset-continue into the first 5 rows of
    * page 2, each carrying the token that produced them. The cursor
    * is a 1-row broadcast against the patient scan. */
  def nextToken(spark: SparkSession, dir: String): DataFrame = {
    val tsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    val page1Last = Tables.events(spark, dir)
      .filter(col("user_id") === 13)
      .select(col("event_id"), col("ts"))
      .orderBy(col("ts"), col("event_id"))
      .limit(20)
      .agg(max(struct(col("ts"), col("event_id"))).as("c"))
    val token = page1Last.select(
      base64(concat(
        lit("{\"ts\":\""), date_format(col("c.ts"), tsFmt),
        lit("\",\"id\":"), col("c.event_id"), lit("}")).cast("binary"))
        .as("next_token"))
    val cursor = token.select(
      col("next_token"),
      to_timestamp(get_json_object(unbase64(col("next_token")).cast("string"), "$.ts"),
        tsFmt).as("cts"),
      get_json_object(unbase64(col("next_token")).cast("string"), "$.id")
        .cast("long").as("cid"))
    Tables.events(spark, dir)
      .filter(col("user_id") === 13)
      .select(col("event_id"), col("ts"), col("value"))
      .crossJoin(broadcast(cursor))
      .filter(col("ts") > col("cts") ||
        (col("ts") === col("cts") && col("event_id") > col("cid")))
      .orderBy(col("ts"), col("event_id"))
      .limit(5)
      .select(col("next_token"), col("event_id"), col("ts"), col("value"))
  }

  val nextTokenSql: String =
    """WITH page1 AS (
      |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events WHERE user_id = 13
      |  ORDER BY ts, event_id LIMIT 20
      |), last AS (
      |  SELECT ts, event_id FROM page1
      |  ORDER BY ts DESC, event_id DESC LIMIT 1
      |), tok AS (
      |  SELECT base64(encode(
      |    '{"ts":"' || strftime(ts, '%Y-%m-%d %H:%M:%S.%f')
      |      || '","id":' || event_id || '}')) AS next_token
      |  FROM last
      |), cur AS (
      |  SELECT next_token,
      |    strptime(json_extract_string(decode(from_base64(next_token)), '$.ts'),
      |      '%Y-%m-%d %H:%M:%S.%f') AS cts,
      |    CAST(json_extract_string(decode(from_base64(next_token)), '$.id')
      |      AS BIGINT) AS cid
      |  FROM tok
      |)
      |SELECT next_token, event_id, CAST(ts AS TIMESTAMP) AS ts, value
      |FROM events, cur
      |WHERE user_id = 13
      |  AND (ts > cts OR (ts = cts AND event_id > cid))
      |ORDER BY ts, event_id
      |LIMIT 5""".stripMargin

  /** E8 `api_multi_get` — batch point-get: N (patient, code) keys
    * answered in ONE pass (the BatchGetItem / GraphQL-dataloader
    * analogue of E3's per-key lookup). The probe set broadcasts and
    * SEMI-JOINS the events table BEFORE the latest-observation window
    * — the window only sees rows for requested keys, the batch
    * equivalent of N key-prefix range reads, not a full scan ranked
    * then filtered. Missing keys return no row (BatchGetItem
    * semantics); one probe here is deliberately absent. */
  def multiGet(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val probes = Seq(
      (13L, "purchase"), (13L, "click"), (42L, "purchase"),
      (77L, "view"), (5L, "click"), (99999L, "purchase"))
      .toDF("p_user", "p_type")
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .join(broadcast(probes),
        col("user_id") === col("p_user") && col("event_type") === col("p_type"),
        "left_semi")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("ts"), col("value"))
  }

  val multiGetSql: String =
    """SELECT user_id, event_type, event_id, CAST(ts AS TIMESTAMP) AS ts, value
      |FROM (
      |  SELECT user_id, event_type, event_id, ts, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id, event_type
      |                       ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events
      |  WHERE (user_id, event_type) IN (
      |    (13, 'purchase'), (13, 'click'), (42, 'purchase'),
      |    (77, 'view'), (5, 'click'), (99999, 'purchase'))
      |) WHERE rn = 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "api_multi_get" -> (multiGet _),
    "api_next_token" -> (nextToken _),
    "api_limit_clamp" -> (limitClamp _),
    "api_get_patient" -> (getPatient _),
    "api_obs_by_patient" -> (obsByPatient _),
    "api_latest_observation" -> (latestObservation _),
    "api_obs_page_after" -> (obsPageAfter _),
    "api_obs_asof_join" -> (obsAsofJoin _))

  val oracles: Map[String, String] = Map(
    "api_multi_get" -> multiGetSql,
    "api_next_token" -> nextTokenSql,
    "api_limit_clamp" -> limitClampSql,
    "api_get_patient" -> getPatientSql,
    "api_obs_by_patient" -> obsByPatientSql,
    "api_latest_observation" -> latestObservationSql,
    "api_obs_page_after" -> obsPageAfterSql,
    "api_obs_asof_join" -> obsAsofJoinSql)
}
