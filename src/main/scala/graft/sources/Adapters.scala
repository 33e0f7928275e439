package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.operators.Obs

/** Source adapters (reference: libs/adapters/csv/labx.ts,
  * libs/adapters/hl7/v2.ts, generic JSON ingest in
  * services/normalize/handler.ts routing).
  *
  * The reference parses one payload per Lambda invocation; here each
  * payload is a row and the parser is a pure Column pipeline
  * (split/regexp/cast — all codegen'd, no UDFs), so parsing 100 TB of
  * raw payloads is a narrow scan-project stage with no shuffle.
  *
  * Payloads are synthesized deterministically from `events` (the
  * driver-provided raw stream), including deliberately malformed rows
  * (non-numeric values every 97th event, absent unit components) so
  * the adapter's drop/fallback semantics have work to do — then parsed
  * back. The synth+parse round trip is the operator under test.
  */
object Adapters {

  /** Raw CSV labx line: patientId,code,value,unit,effectiveDateTime
    * (reference: libs/adapters/csv/labx.ts header contract).
    *
    * Injected defect classes: every 97th value is non-numeric ("N/A"
    * -> NULL -> DTO reject), every 103rd is "Infinity" — which PASSES
    * DTO validation (Zod z.number() accepts Infinity, dto.ts:7) but
    * is not representable as a JSON number, so the downstream FHIR
    * structural validation rejects it (the exact defect class the
    * reference's AJV-after-Zod check exists to catch,
    * services/normalize/handler.ts:108-111). 97 wins on collisions
    * (first when() branch). */
  def csvLine: Column = concat_ws(",",
    col("user_id"), col("event_type"),
    when(pmod(col("event_id"), lit(97)) === 0, lit("N/A"))
      .when(pmod(col("event_id"), lit(103)) === 0, lit("Infinity"))
      .otherwise(Obs.valueCanon),
    lit("mg/dL"), Obs.tsCanon)

  /** B1 `adapter_csv_labx` — CSV line -> typed DTO columns. Value is
    * cast permissively: non-numeric -> NULL (the reference's
    * Number(...) -> NaN -> dropped later by validation).
    *
    * Staged projections, deliberately: `line` is referenced twice
    * (split + sha2) and the split array `p` five times, so
    * CollapseProject keeps each stage materialized and every expensive
    * expression (concat_ws, split, sha2, to_timestamp) appears exactly
    * ONCE in the physical plan. A single flat projection instead
    * re-derives the whole synth+parse tree once per output column
    * after projection collapse — correct only as fast as codegen
    * subexpression elimination. Measured equal at sf0.1 with CSE on
    * AND off (~1.5-2 s either way), so this is robustness, not a
    * hot-path fix. */
  def csvLabx(spark: SparkSession, dir: String): DataFrame =
    csvLabxFrom(Tables.events(spark, dir))

  /** Same transform over any events-shaped frame — the streaming twin
    * feeds a stream through it (pure Column pipeline, so it runs
    * unchanged under Structured Streaming). */
  def csvLabxFrom(events: DataFrame): DataFrame =
    events
      .select(col("event_id"), csvLine.as("line"))
      .select(col("event_id"), split(col("line"), ",").as("p"),
        sha2(col("line"), 256).as("ingest_hash"))
      .select(
        col("event_id"),
        element_at(col("p"), 1).as("patient_id"),
        element_at(col("p"), 2).as("code"),
        element_at(col("p"), 3).cast("double").as("value"),
        element_at(col("p"), 4).as("unit"),
        to_timestamp(element_at(col("p"), 5), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("effective"),
        lit("labx-csv").as("source_system"),
        col("ingest_hash"))

  def csvLabxSql: String =
    """WITH raw AS (
      |  SELECT event_id,
      |    concat_ws(',', user_id, event_type,
      |      CASE WHEN event_id % 97 = 0 THEN 'N/A'
      |           WHEN event_id % 103 = 0 THEN 'Infinity'
      |           ELSE CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) END,
      |      'mg/dL', strftime(ts, '%Y-%m-%d %H:%M:%S.%f')) AS line
      |  FROM events
      |), f AS (SELECT event_id, line, str_split(line, ',') AS p FROM raw)
      |SELECT event_id,
      |  p[1] AS patient_id,
      |  p[2] AS code,
      |  TRY_CAST(p[3] AS DOUBLE) AS value,
      |  p[4] AS unit,
      |  strptime(p[5], '%Y-%m-%d %H:%M:%S.%f') AS effective,
      |  'labx-csv' AS source_system,
      |  sha256(line) AS ingest_hash
      |FROM f""".stripMargin

  /** Raw HL7 v2 message: PID + 1-3 OBX segments (`event_id % 3 + 1`),
    * CR-separated — real lab messages batch several results per
    * message and the reference loops over every OBX
    * (libs/adapters/hl7/v2.ts:50-70), so the synth must exercise the
    * one-to-many explode path. OBX k carries value+`k-1` so exploded
    * rows are distinguishable. Unit field exercises the reference's
    * fallback chain: every 7th event has no unit (-> default "1"),
    * every 3rd only OBX-6.1 (-> fallback to component 1), rest have
    * OBX-6.2. */
  def hl7Message: Column = {
    val unitField = when(pmod(col("event_id"), lit(7)) === 0, lit(""))
      .when(pmod(col("event_id"), lit(3)) === 0, lit("mg"))
      .otherwise(lit("mg^mg/dL"))
    val nObx = (pmod(col("event_id"), lit(3)) + 1).cast("int")
    // lambda-free: higher-order functions (transform/sequence) are
    // interpreted per row and eject the whole projection from
    // whole-stage codegen — the bounded segment count (1-3) unrolls
    // to plain when()s, and concat_ws skips the null absent segments
    def obxSeg(k: Int): Column = {
      val valueField = when(pmod(col("event_id"), lit(97)) === 0, lit("N/A"))
        .otherwise((col("value") + lit(k - 1)).cast(DecimalType(18, 2)).cast("string"))
      concat(
        lit(s"OBX|$k|NM|"), col("event_type"), lit("^"),
        upper(col("event_type")), lit("||"), valueField, lit("|"), unitField,
        lit("|||||F|||"), date_format(col("ts"), "yyyyMMddHHmmss"))
    }
    concat(
      lit("PID|1||"), col("user_id"), lit("^^^MRN||DOE^JOHN"), lit("\r"),
      concat_ws("\r", obxSeg(1),
        when(nObx >= 2, obxSeg(2)), when(nObx >= 3, obxSeg(3))))
  }

  /** B2+B3 `adapter_hl7_obx` — HL7 v2 PID/OBX parser: segment split on
    * CR, field split on '|', component split on '^'. patientId =
    * PID-3.1 (reference: libs/adapters/hl7/v2.ts:37-48); code =
    * OBX-3.1 fallback .2 (v2.ts:53-58); value = OBX-5 numeric,
    * non-numeric rows dropped (v2.ts:58-62); unit = OBX-6.2 fallback
    * .1 default "1" (v2.ts:66 `c6[1] || c6[0] || "" -> "1"`);
    * effective = OBX-14 YYYYMMDDHHMMSS -> UTC timestamp (v2.ts:68). */
  def hl7Obx(spark: SparkSession, dir: String): DataFrame =
    hl7ObxFrom(Tables.events(spark, dir, fan = true))

  /** Same parser over any events-shaped frame (pure Column pipeline),
    * so the C8 source-routing dispatch can feed it a route slice. */
  def hl7ObxFrom(events: DataFrame): DataFrame = {
    // PID via regexp (codegen'd) instead of filter(split(...)) array
    // lambdas (interpreted); patient_id derived ONCE per message
    // before the explode fan-out. OBX selection = explode every
    // segment, then a codegen'd startsWith row filter.
    val pidF = split(
      regexp_extract(col("msg"), "(?:^|\r)(PID\\|[^\r]*)", 1), "\\|")
    val df = events
      .select(col("event_id"), hl7Message.as("msg"))
      .select(col("event_id"),
        element_at(split(element_at(pidF, 4), "\\^"), 1).as("patient_id"),
        col("msg"))
      .withColumn("obx", explode(split(col("msg"), "\r")))
      .filter(col("obx").startsWith("OBX|"))
      .withColumn("f", split(col("obx"), "\\|"))
    val code3 = split(element_at(col("f"), 4), "\\^")
    val unit6 = split(element_at(col("f"), 7), "\\^")
    df.select(
        col("event_id"),
        col("patient_id"),
        coalesce(nullif(element_at(code3, 1), lit("")),
          element_at(code3, 2)).as("code"),
        element_at(col("f"), 6).cast("double").as("value"),
        coalesce(nullif(element_at(unit6, 2), lit("")),
          nullif(element_at(unit6, 1), lit("")), lit("1")).as("unit"),
        to_timestamp(element_at(col("f"), 15), "yyyyMMddHHmmss").as("effective"))
      .filter(col("value").isNotNull) // non-numeric OBX-5 dropped
  }

  def hl7ObxSql: String =
    """WITH raw AS (
      |  SELECT event_id,
      |    'PID|1||' || user_id || '^^^MRN||DOE^JOHN' || chr(13) ||
      |    array_to_string(list_transform(range(1, event_id % 3 + 2), k ->
      |      'OBX|' || k || '|NM|' || event_type || '^' || upper(event_type) || '||' ||
      |      CASE WHEN event_id % 97 = 0 THEN 'N/A'
      |           ELSE CAST(CAST(value + (k-1) AS DECIMAL(18,2)) AS VARCHAR) END || '|' ||
      |      CASE WHEN event_id % 7 = 0 THEN ''
      |           WHEN event_id % 3 = 0 THEN 'mg'
      |           ELSE 'mg^mg/dL' END || '|||||F|||' ||
      |      strftime(ts, '%Y%m%d%H%M%S')), chr(13)) AS msg
      |  FROM events
      |), seg AS (
      |  SELECT event_id,
      |    list_filter(str_split(msg, chr(13)), s -> starts_with(s, 'PID|'))[1] AS pid,
      |    unnest(list_filter(str_split(msg, chr(13)), s -> starts_with(s, 'OBX|'))) AS obx
      |  FROM raw
      |), parsed AS (
      |  SELECT event_id,
      |    str_split(str_split(pid, '|')[4], '^')[1] AS patient_id,
      |    coalesce(nullif(str_split(str_split(obx, '|')[4], '^')[1], ''),
      |             str_split(str_split(obx, '|')[4], '^')[2]) AS code,
      |    TRY_CAST(str_split(obx, '|')[6] AS DOUBLE) AS value,
      |    coalesce(nullif(str_split(str_split(obx, '|')[7], '^')[2], ''),
      |             nullif(str_split(str_split(obx, '|')[7], '^')[1], ''),
      |             '1') AS unit,
      |    strptime(str_split(obx, '|')[15], '%Y%m%d%H%M%S') AS effective
      |  FROM seg
      |)
      |SELECT * FROM parsed WHERE value IS NOT NULL""".stripMargin

  /** B4 `adapter_json_generic` — generic JSON payload ingest:
    * from_json with an explicit schema (reference: the normalize
    * handler's fallback route for application/json payloads). */
  def jsonGeneric(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("payload_k"),
        lit("generic-json").as("source_system"))
      .filter(col("payload_k").isNotNull)

  def jsonGenericSql: String =
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS INT) AS payload_k,
      |  'generic-json' AS source_system
      |FROM events
      |WHERE json_extract_string(props, '$.k') IS NOT NULL""".stripMargin

  /** B5 `adapter_fixedwidth` — fixed-width record parser (the other
    * classic healthcare interface format besides delimited and HL7):
    * positional substring extraction + trim + cast. Synth layout:
    * cols 1-6 patient id (zero-padded), 7-16 code (space-padded),
    * 17-28 value (zero-padded decimal), 29-42 yyyyMMddHHmmss. */
  def fixedWidth(spark: SparkSession, dir: String): DataFrame = {
    val line = concat(
      lpad(col("user_id").cast("string"), 6, "0"),
      rpad(col("event_type"), 10, " "),
      lpad(Obs.valueCanon, 12, "0"),
      date_format(col("ts"), "yyyyMMddHHmmss"))
    Tables.events(spark, dir)
      .select(col("event_id"), line.as("line"))
      .select(
        col("event_id"),
        substring(col("line"), 1, 6).cast("long").as("patient_id"),
        trim(substring(col("line"), 7, 10)).as("code"),
        substring(col("line"), 17, 12).cast("double").as("value"),
        to_timestamp(substring(col("line"), 29, 14), "yyyyMMddHHmmss").as("effective"))
  }

  def fixedWidthSql: String =
    """WITH raw AS (
      |  SELECT event_id,
      |    lpad(CAST(user_id AS VARCHAR), 6, '0')
      |    || rpad(event_type, 10, ' ')
      |    || lpad(CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR), 12, '0')
      |    || strftime(ts, '%Y%m%d%H%M%S') AS line
      |  FROM events
      |)
      |SELECT event_id,
      |  CAST(substring(line, 1, 6) AS BIGINT) AS patient_id,
      |  trim(substring(line, 7, 10)) AS code,
      |  CAST(substring(line, 17, 12) AS DOUBLE) AS value,
      |  strptime(substring(line, 29, 14), '%Y%m%d%H%M%S') AS effective
      |FROM raw""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "adapter_fixedwidth" -> (fixedWidth _),
    "adapter_csv_labx" -> (csvLabx _),
    "adapter_hl7_obx" -> (hl7Obx _),
    "adapter_json_generic" -> (jsonGeneric _))

  val oracles: Map[String, String] = Map(
    "adapter_fixedwidth" -> fixedWidthSql,
    "adapter_csv_labx" -> csvLabxSql,
    "adapter_hl7_obx" -> hl7ObxSql,
    "adapter_json_generic" -> jsonGenericSql)
}
