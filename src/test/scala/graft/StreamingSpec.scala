package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.streaming.StreamOps
import graft.streaming.StreamOps.Event

/** Structured Streaming twins vs their batch oracles (SURVEY §2.L).
  * Events are fed through MemoryStream in ts order plus a far-future
  * sentinel that advances the watermark so all windows/sessions
  * flush; results must match the batch operators on the same data. */
class StreamingSpec extends SparkSpecBase {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private lazy val batchEvents: Seq[Event] =
    Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id)).toSeq

  /** One sentinel event far past everything, for a user id that does
    * not occur in the data; advances the watermark to flush state. */
  private def sentinel: Event =
    Event(-1L, Timestamp.valueOf("2030-01-01 00:00:00"), -1L, "sentinel", 0.0)

  private def runStream[T](q: StreamingQuery, ms: MemoryStream[Event]): Unit = {
    val (first, second) = batchEvents.splitAt(batchEvents.size / 2)
    ms.addData(first); q.processAllAvailable()
    ms.addData(second); q.processAllAvailable()
    ms.addData(Seq(sentinel)); q.processAllAvailable()
    q.stop()
  }

  test("H4t streaming ANN serve: arbitrary splits + re-delivery ≡ the batch probe, exactly once") {
    val (queries, cents, assigned, nProbe, k) =
      operators.Similarity.streamServeFixture(spark, sf)
    assert(queries.nonEmpty && cents.nonEmpty)
    // freeze the static inverted file (H23's between-refreshes state)
    val frozen = assigned.localCheckpoint()
    val ms = MemoryStream[StreamOps.QueryVec]
    val q = StreamOps.annServe(ms.toDS(), cents, frozen, nProbe, k, spark)
      .writeStream.format("memory").queryName("s_annserve")
      .outputMode("append").start()
    // three arbitrary micro-batch splits, with query 0 RE-DELIVERED in
    // the last batch — the idempotency contract must suppress it
    val (a, rest) = queries.splitAt(math.max(1, queries.size / 3))
    val (b, c) = rest.splitAt(math.max(1, rest.size / 2))
    ms.addData(a); q.processAllAvailable()
    ms.addData(b); q.processAllAvailable()
    ms.addData(c ++ Seq(queries.head)); q.processAllAvailable()
    q.stop()
    val got = spark.table("s_annserve")
      .select("qid", "rank", "vec_id", "cosine", "cell")
      .collect().map(_.toSeq)
    val want = run("sim_ivf_probe")
      .select("qid", "rank", "vec_id", "cosine", "cell")
      .collect().map(_.toSeq)
    // exactly-once: multiset equality (no duplicate serve for qid 0)
    assert(got.length == want.length,
      s"served ${got.length} rows, batch probe has ${want.length}")
    assert(got.toSet == want.toSet)
  }

  test("L1 streaming tumbling agg matches batch on flushed windows") {
    val ms = MemoryStream[Event]
    val q = StreamOps.tumblingAgg(ms.toDF())
      .writeStream.format("memory").queryName("s_tumbling")
      .outputMode("append").start()
    runStream(q, ms)
    val got = spark.table("s_tumbling")
      .filter(col("event_type") =!= "sentinel")
      .select("window_start", "event_type", "n_events", "value_sum")
      .collect().map(_.toSeq).toSet
    val want = run("stream_tumbling_agg")
      .select("window_start", "event_type", "n_events", "value_sum")
      .collect().map(_.toSeq).toSet
    assert(got == want)
  }

  test("L9 streaming hopping agg matches batch on flushed windows") {
    val ms = MemoryStream[Event]
    val q = StreamOps.hoppingAgg(ms.toDF())
      .writeStream.format("memory").queryName("s_hopping")
      .outputMode("append").start()
    runStream(q, ms)
    val got = spark.table("s_hopping")
      .filter(col("event_type") =!= "sentinel")
      .select("window_start", "event_type", "n_events", "value_sum")
      .collect().map(_.toSeq).toSet
    val want = run("stream_hopping_agg")
      .select("window_start", "event_type", "n_events", "value_sum")
      .collect().map(_.toSeq).toSet
    assert(got == want)
  }

  test("L7 native session_window streaming twin matches the batch query") {
    val ms = MemoryStream[Event]
    val q = StreamOps.sessionWindowAgg(ms.toDF().withWatermark("ts", "10 minutes"))
      .writeStream.format("memory").queryName("s_sesswin")
      .outputMode("append").start()
    runStream(q, ms)
    val cols = Seq("user_id", "session_start", "session_end", "n_events", "value_sum")
    val got = spark.table("s_sesswin")
      .filter(col("user_id") =!= -1L)
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    val want = run("stream_session_window")
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    assert(got == want)
  }

  test("L2 streaming sessionization matches batch sessions exactly") {
    val ms = MemoryStream[Event]
    val q = StreamOps.sessionize(ms.toDS(), spark)
      .writeStream.format("memory").queryName("s_sessions")
      .outputMode("append").start()
    runStream(q, ms)
    val got = spark.table("s_sessions")
      .filter(col("user_id") =!= -1L)
      .select("user_id", "session_start", "session_end", "n_events")
      .collect().map(_.toSeq).toSet
    val want = run("stream_sessionize")
      .select("user_id", "session_start", "session_end", "n_events")
      .collect().map(_.toSeq).toSet
    assert(got == want,
      s"streaming sessions ${got.size} vs batch ${want.size}; " +
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
  }

  test("E5 streaming as-of join matches the batch custom operator") {
    val ms = MemoryStream[Event]
    val q = StreamOps.asofJoin(ms.toDS(), spark)
      .writeStream.format("memory").queryName("s_asof")
      .outputMode("append").start()
    runStream(q, ms)
    val got = spark.table("s_asof")
      .filter(col("user_id") =!= -1L)
      .collect().map(_.toSeq).toSet
    val want = batchAsofAllTenants
      .select(col("probe_id"), col("user_id"), col("probe_ts"),
        col("obs_event_id"), col("obs_ts"), col("obs_value"))
      .collect().map(_.toSeq).toSet
    assert(got == want,
      s"streaming asof ${got.size} vs batch ${want.size}; " +
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
  }

  /** The streaming twin consumes ALL tenants' events, so its batch
    * equal is the underlying as-of operator unscoped — the registry
    * pin `api_obs_asof_join` serves one tenant (r6 tenancy). */
  private def batchAsofAllTenants = {
    val ev = Tables.events(spark, sf)
    graft.plans.AsOf.join(
      probe = ev.filter(col("event_type") === "purchase"),
      obs = ev.filter(col("event_type") === "click"),
      key = "user_id", ts = "ts", id = "event_id", value = "value")
  }

  test("L3 streaming dedup keeps one event per (user, type, minute)") {
    val ms = MemoryStream[Event]
    val q = StreamOps.eventDedup(ms.toDF())
      .writeStream.format("memory").queryName("s_dedup")
      .outputMode("append").start()
    runStream(q, ms)
    val got = spark.table("s_dedup")
      .filter(col("user_id") =!= -1L)
      .select(col("user_id"), col("event_type"), col("ts_bucket"))
      .collect().map(_.toSeq).toSet
    val want = run("stream_event_dedup")
      .select(col("user_id"), col("event_type"),
        date_trunc("minute", col("ts")).as("ts_bucket"))
      .collect().map(_.toSeq).toSet
    assert(got == want)
  }

  test("L5 streaming interval join matches the batch interval join") {
    val msP = MemoryStream[Event]
    val msC = MemoryStream[Event]
    val q = StreamOps.intervalJoin(msP.toDF(), msC.toDF())
      .writeStream.format("memory").queryName("s_interval")
      .outputMode("append").start()
    val (purchases, clicks) = (
      batchEvents.filter(_.event_type == "purchase"),
      batchEvents.filter(_.event_type == "click"))
    msP.addData(purchases); msC.addData(clicks)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("s_interval")
      .select("purchase_id", "click_id").collect().map(_.toSeq).toSet
    val want = run("stream_interval_join")
      .select("purchase_id", "click_id").collect().map(_.toSeq).toSet
    assert(got == want,
      s"stream ${got.size} vs batch ${want.size} joined pairs")
  }

  test("L8 streaming left-outer interval join matches batch incl. null rows") {
    val msP = MemoryStream[Event]
    val msC = MemoryStream[Event]
    val q = StreamOps.intervalJoinOuter(msP.toDF(), msC.toDF())
      .writeStream.format("memory").queryName("s_interval_outer")
      .outputMode("append").start()
    val (purchases, clicks) = (
      batchEvents.filter(_.event_type == "purchase"),
      batchEvents.filter(_.event_type == "click"))
    msP.addData(purchases); msC.addData(clicks)
    q.processAllAvailable()
    // advance BOTH watermarks so unmatched purchases flush their null rows
    msP.addData(Seq(sentinel)); msC.addData(Seq(sentinel))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("s_interval_outer")
      .filter(col("user_id") =!= -1L)
      .select("purchase_id", "click_id").collect().map(_.toSeq).toSet
    val want = run("stream_interval_join_outer")
      .select("purchase_id", "click_id").collect().map(_.toSeq).toSet
    assert(got == want,
      s"stream ${got.size} vs batch ${want.size} rows (incl. unmatched)")
    // the outer rows are the point: some purchases must be unattributed
    assert(got.exists(_(1) == null))
  }

  test("M1 stateless corpus op runs unchanged under Structured Streaming") {
    // the redact transform is a pure scan-project, so the SAME code
    // path serves batch and streaming; results must be identical.
    // Feed the PII-INJECTED text (the raw corpus has no PII, which
    // would make the equality vacuously green)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"),
        graft.operators.Corpus.piiText.as("text"))
    val ms = MemoryStream[(Long, String, String)]
    val q = graft.operators.Corpus.redact(
        ms.toDF().toDF("doc_id", "lang", "text"))
      .writeStream.format("memory").queryName("s_redact")
      .outputMode("append").start()
    ms.addData(docs.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2))).toSeq)
    q.processAllAvailable(); q.stop()
    val got = spark.table("s_redact").collect().map(_.toSeq).toSet
    val want = graft.operators.Corpus.redact(docs).collect().map(_.toSeq).toSet
    assert(got == want)
    // and the comparison is not vacuous: the stream really redacted
    assert(spark.table("s_redact").filter(col("n_emails") > 0).count() > 0)
  }

  test("custom expression is callable from SQL via GraftExtensions") {
    val r = spark.sql(
      """SELECT float_vector_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                        array(CAST(3.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS d
        |""".stripMargin).head.getDouble(0)
    assert(math.abs(r - 5.5) < 1e-12)
  }

  test("L2 sessionization on the RocksDB state store matches batch") {
    // the production state backend for state larger than executor heap
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[Event]
      val q = StreamOps.sessionize(ms.toDS(), spark)
        .writeStream.format("memory").queryName("s_sessions_rocks")
        .outputMode("append").start()
      runStream(q, ms)
      val got = spark.table("s_sessions_rocks")
        .filter(col("user_id") =!= -1L)
        .select("user_id", "session_start", "session_end", "n_events")
        .collect().map(_.toSeq).toSet
      val want = run("stream_sessionize")
        .select("user_id", "session_start", "session_end", "n_events")
        .collect().map(_.toSeq).toSet
      assert(got == want)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("file-source to parquet-sink: stop/restart on a checkpoint is exactly-once") {
    val base = java.nio.file.Files.createTempDirectory("stream_eo").toString
    val (inDir, outDir, cp) = (s"$base/in", s"$base/out", s"$base/cp")
    new java.io.File(inDir).mkdirs()
    val ev = Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val schema = ev.schema
    def addFiles(df: org.apache.spark.sql.DataFrame, tag: String): Unit = {
      val stage = s"$base/stage_$tag"
      df.coalesce(1).write.mode("overwrite").parquet(stage)
      new java.io.File(stage).listFiles().filter(_.getName.endsWith(".parquet"))
        .zipWithIndex.foreach { case (f, i) =>
          java.nio.file.Files.copy(f.toPath,
            java.nio.file.Paths.get(s"$inDir/${tag}_$i.parquet"))
        }
    }
    def startQuery() = StreamOps.parquetSink(
      spark.readStream.schema(schema).parquet(inDir), outDir, cp).start()

    addFiles(ev.filter(col("event_id") % 2 === 0), "even")
    val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
    addFiles(ev.filter(col("event_id") % 2 =!= 0), "odd")
    val q2 = startQuery(); q2.processAllAvailable(); q2.stop()

    val out = spark.read.parquet(outDir)
    assert(out.count() == ev.count(), "no lost rows across restart")
    assert(out.select("event_id").distinct().count() == ev.count(),
      "no duplicated rows across restart")
  }

  test("E5 as-of twin: RocksDB state restores across a checkpointed restart") {
    // the production restart story: per-user LastObs state written by
    // the first run must come back from the RocksDB checkpoint, or
    // post-restart probes lose their pre-restart observations
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val base = java.nio.file.Files.createTempDirectory("asof_restart").toString
      val (inDir, outDir, cp) = (s"$base/in", s"$base/out", s"$base/cp")
      new java.io.File(inDir).mkdirs()
      val schema = spark.emptyDataset[Event].schema
      def addFiles(evs: Seq[Event], tag: String): Unit = {
        val stage = s"$base/stage_$tag"
        evs.toDS().coalesce(1).write.mode("overwrite").parquet(stage)
        new java.io.File(stage).listFiles().filter(_.getName.endsWith(".parquet"))
          .zipWithIndex.foreach { case (f, i) =>
            java.nio.file.Files.copy(f.toPath,
              java.nio.file.Paths.get(s"$inDir/${tag}_$i.parquet"))
          }
      }
      def startQuery() = StreamOps.asofJoin(
          spark.readStream.schema(schema).parquet(inDir).as[Event], spark)
        .toDF().writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", cp).outputMode("append").start()

      // split on a ts boundary so equal-ts click/purchase pairs stay
      // in one phase (the obs-before-probe tie rule needs them together)
      val cutoff = batchEvents(batchEvents.size / 2).ts.getTime
      addFiles(batchEvents.filter(_.ts.getTime <= cutoff), "early")
      val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
      addFiles(batchEvents.filter(_.ts.getTime > cutoff), "late")
      val q2 = startQuery(); q2.processAllAvailable(); q2.stop()

      val cols = Seq("probe_id", "user_id", "probe_ts",
        "obs_event_id", "obs_ts", "obs_value")
      val out = spark.read.parquet(outDir).cache()
      val got = out.select(cols.head, cols.tail: _*)
        .collect().map(_.toSeq).toSet
      val want = batchAsofAllTenants
        .select(cols.head, cols.tail: _*)
        .collect().map(_.toSeq).toSet
      assert(got == want,
        s"restarted asof ${got.size} vs batch ${want.size}; " +
          s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
      // the equality above only proves restore if some post-restart
      // probe actually depended on pre-restart state — assert that
      val crossed = out.filter(col("probe_ts") > new Timestamp(cutoff) &&
        col("obs_ts").isNotNull && col("obs_ts") <= new Timestamp(cutoff))
      assert(crossed.count() > 0, "no probe crossed the restart boundary")
      out.unpersist()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("L6 stream-static enrichment join converges to the batch rollup") {
    val ms = MemoryStream[Event]
    val q = StreamOps.enrichedRollup(ms.toDF(), Tables.customer(spark, sf))
      .writeStream.format("memory").queryName("s_enriched")
      .outputMode("update").start()
    runStream(q, ms) // sentinel user -1 has no registry row -> dropped
    // update mode emits one row per key per trigger; n_events grows
    // monotonically, so the max-struct row is the final state
    val got = spark.table("s_enriched")
      .groupBy("segment", "event_type")
      .agg(max(struct(col("n_events"), col("value_sum"))).as("s"))
      .select(col("segment"), col("event_type"),
        col("s.n_events"), col("s.value_sum"))
      .collect().map(_.toSeq).toSet
    val want = run("stream_enriched_rollup")
      .select("segment", "event_type", "n_events", "value_sum")
      .collect().map(_.toSeq).toSet
    assert(got == want,
      s"stream ${got.size} vs batch ${want.size}; " +
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
  }

  test("P1 streaming end-to-end pipeline converges to the batch latest state") {
    val ms = MemoryStream[Event]
    val q = StreamOps.pipelineLatestState(ms.toDF(), spark)
      .writeStream.format("memory").queryName("s_pipeline")
      .outputMode("update").start()
    runStream(q, ms)
    // update mode emits one row per key per trigger: keep the last
    // (max n_observations) update per (patient, code); the sentinel
    // user's synthetic row (patient_id "-1") is excluded
    val got = spark.table("s_pipeline")
      .filter(col("patient_id") =!= "-1")
      .groupBy("patient_id", "code")
      .agg(max(struct(col("n_observations"), col("latest_effective"),
        col("latest_value"), col("latest_ingest_hash"))).as("s"))
      .select(col("patient_id"), col("code"), col("s.n_observations"),
        col("s.latest_value"), col("s.latest_effective"), col("s.latest_ingest_hash"))
      .collect().map(_.toSeq).toSet
    val want = run("pipeline_end_to_end")
      .select(col("patient_id"), col("code"), col("n_observations"),
        col("latest_value"), col("latest_effective"), col("latest_ingest_hash"))
      .collect().map(_.toSeq).toSet
    assert(got == want)
  }

  test("D2 streaming upsert twin equals the batch conditional-write replay") {
    val ms = MemoryStream[Event]
    val q = StreamOps.upsertState(ms.toDS(), spark)
      .writeStream.format("memory").queryName("s_upsert")
      .outputMode("update").start()
    runStream(q, ms)
    // update mode emits one row per touched key per trigger: the row
    // with the highest version is the final stored state
    val got = spark.table("s_upsert")
      .filter(col("user_id") =!= -1L)
      .groupBy("user_id", "event_type")
      .agg(max(struct(col("version"), col("last_ts"), col("last_ik"),
        col("last_value"))).as("s"))
      .select(col("user_id"), col("event_type"), col("s.version"),
        col("s.last_value"), col("s.last_ts"), col("s.last_ik"))
      .collect().map(_.toSeq).toSet
    val want = run("persist_upsert_version")
      .select(col("user_id"), col("event_type"), col("version"),
        col("last_value"), col("last_ts"), col("last_ik"))
      .collect().map(_.toSeq).toSet
    assert(got == want, "streaming conditional-write state diverges from batch D2")
  }

  test("D7 streaming scd2 emits exactly the batch history's closed intervals") {
    val ms = MemoryStream[Event]
    val q = StreamOps.scd2Closes(ms.toDS(), spark)
      .writeStream.format("memory").queryName("s_scd2")
      .outputMode("append").start()
    runStream(q, ms)
    val got = spark.table("s_scd2")
      .filter(col("user_id") =!= -1L)
      .select("user_id", "event_type", "version", "value", "ik",
        "valid_from", "valid_to")
      .collect().map(_.toSeq).toSet
    // batch D7's non-current slice: every version a later write closed
    // batch version is the window's Int; the stream state counts Long
    val want = run("persist_scd2")
      .filter(!col("is_current"))
      .select(col("user_id"), col("event_type"),
        col("version").cast("long").as("version"), col("value"), col("ik"),
        col("valid_from"), col("valid_to"))
      .collect().map(_.toSeq).toSet
    assert(got == want, "streaming SCD2 closes diverge from the batch history")
  }

  test("D9 streaming tombstone twin: present slice = batch view, absent slice = purge list") {
    val ms = MemoryStream[Event]
    val q = StreamOps.tombstoneState(ms.toDS(), spark)
      .writeStream.format("memory").queryName("s_tomb")
      .outputMode("update").start()
    runStream(q, ms)
    // update mode: one row per touched key per trigger; highest
    // version = the final stored lineage
    val fin = spark.table("s_tomb")
      .filter(col("user_id") =!= -1L)
      .groupBy("user_id", "event_type")
      .agg(max(struct(col("version"), col("n_deletes"), col("last_ts"),
        col("last_value"), col("present"))).as("s"))
      .cache()
    val got = fin.filter(col("s.present"))
      .select(col("user_id"), col("event_type"), col("s.version"),
        col("s.n_deletes"), col("s.last_value"), col("s.last_ts"))
      .collect().map(_.toSeq).toSet
    val want = run("persist_tombstone")
      .select(col("user_id"), col("event_type"), col("version"),
        col("n_deletes"), col("last_value"), col("last_ts"))
      .collect().map(_.toSeq).toSet
    assert(got == want, "streaming tombstone read view diverges from batch D9")
    // the final present=false emissions are the DeleteItem work list:
    // exactly F10b's purge manifest, with the same lineage counters
    val gotDel = fin.filter(!col("s.present"))
      .select(col("user_id"), col("event_type"), col("s.version"),
        col("s.n_deletes"), col("s.last_ts"))
      .collect().map(_.toSeq).toSet
    val wantDel = run("audit_purge_list")
      .select(col("user_id"), col("event_type"), col("version"),
        col("n_deletes"), col("deleted_at"))
      .collect().map(_.toSeq).toSet
    assert(gotDel == wantDel, "streaming delete emissions diverge from the purge list")
    fin.unpersist()
  }

  test("F18 streaming SLO burn monitor converges to the batch multiwindow alert") {
    val ms = MemoryStream[Event]
    val q = StreamOps.sloBurnCounters(ms.toDS(), spark)
      .writeStream.format("memory").queryName("s_slo")
      .outputMode("update").start()
    // no watermark state to flush — feed the two halves, no sentinel
    // (its pmod tenant would pollute t3's counters)
    val (first, second) = batchEvents.splitAt(batchEvents.size / 2)
    ms.addData(first); q.processAllAvailable()
    ms.addData(second); q.processAllAvailable()
    q.stop()
    // update mode re-emits every hour per trigger; counters only grow,
    // so the max-struct per (tenant, date, hour) is the final emission
    val fin = spark.table("s_slo")
      .groupBy("tenant_id", "audit_date", "audit_hour")
      .agg(max(struct(col("n"), col("n_err"), col("n6"), col("err6"))).as("s"))
      .select(col("tenant_id"), col("audit_date"), col("audit_hour"),
        col("s.n"), col("s.n_err"), col("s.n6"), col("s.err6"))
    // the SAME serve projection as the batch query (shared rounding)
    val got = graft.operators.Audit.sloServe(fin, 100L)
      .collect().map(_.toSeq).toSet
    val want = run("audit_slo_burn").collect().map(_.toSeq).toSet
    assert(got == want, "streaming SLO burn monitor diverges from batch F18")
  }

  test("F14 streaming error-spike monitor converges to the batch alarm") {
    val ms = MemoryStream[Event]
    val q = StreamOps.errorSpikeCounters(ms.toDS(), spark)
      .writeStream.format("memory").queryName("s_spike")
      .outputMode("update").start()
    // no watermark state to flush — no sentinel (its pmod tenant
    // would pollute t3's counters, the F18-twin discipline)
    val (first, second) = batchEvents.splitAt(batchEvents.size / 2)
    ms.addData(first); q.processAllAvailable()
    ms.addData(second); q.processAllAvailable()
    q.stop()
    // update mode re-emits every hour per trigger; all four counters
    // only grow, so the lexicographic max per hour = the final emission
    val fin = spark.table("s_spike")
      .groupBy("tenant_id", "audit_date", "audit_hour")
      .agg(max(struct(col("n_total"), col("n_err"), col("trail_total"),
        col("trail_err"))).as("s"))
      .select(col("tenant_id"), col("audit_date"), col("audit_hour"),
        col("s.n_total"), col("s.n_err"), col("s.trail_total"),
        col("s.trail_err"))
    // batch reports the empty frame as NULL trailing sums; the typed
    // streaming emission reports 0 — coalesce on the batch side
    val got = fin.collect().map(_.toSeq).toSet
    val want = run("audit_error_spikes")
      .select(col("tenant_id"), col("audit_date"), col("audit_hour"),
        col("n_total"), col("n_err"),
        coalesce(col("trail_total"), lit(0L)).as("trail_total"),
        coalesce(col("trail_err"), lit(0L)).as("trail_err"))
      .collect().map(_.toSeq).toSet
    assert(got == want, "streaming spike counters diverge from batch F14")
    // the alert flag derives from the streamed counters alone and
    // reproduces the batch booleans (empty frame: trail_total = 0
    // fails `> 0` exactly where batch NULL fails IS NOT NULL)
    val gotFlag = fin.select(col("tenant_id"), col("audit_date"),
        col("audit_hour"),
        (col("trail_total") > 0 &&
          col("n_err") * col("trail_total") >
            col("trail_err") * col("n_total") * 2 &&
          col("n_err") >= 3).as("is_spike"))
      .collect().map(_.toSeq).toSet
    val wantFlag = run("audit_error_spikes")
      .select("tenant_id", "audit_date", "audit_hour", "is_spike")
      .collect().map(_.toSeq).toSet
    assert(gotFlag == wantFlag)
  }

  test("F25 streaming hysteresis alert converges to the batch state machine") {
    val ms = MemoryStream[Event]
    val q = StreamOps.hysteresisState(ms.toDS(), spark)
      .writeStream.format("memory").queryName("s_hyst")
      .outputMode("update").start()
    // three UNEVEN micro-batches (arbitrary splits per the contract);
    // no sentinel — its event_type would route to the dlq service
    val (a, rest) = batchEvents.splitAt(batchEvents.size / 3)
    val (b, c) = rest.splitAt(rest.size / 5)
    ms.addData(a); q.processAllAvailable()
    ms.addData(b); q.processAllAvailable()
    ms.addData(c); q.processAllAvailable()
    q.stop()
    // derived booleans are NOT monotone across re-emissions (a later
    // batch can flip an earlier hour's alarm through the chain): the
    // final row per hour is the max-`seen` emission — update-mode
    // keep-latest semantics made explicit
    val fin = spark.table("s_hyst")
      .groupBy("service", "audit_date", "audit_hour")
      .agg(max(struct(col("seen"), col("n"), col("dur_sum"),
        col("ewma_num"), col("ewma_den"), col("enter_hot"),
        col("exit_cold"), col("alarm"), col("alarm_start"))).as("s"))
      .select(col("service"), col("audit_date"), col("audit_hour"),
        col("s.n"), col("s.enter_hot"), col("s.exit_cold"),
        col("s.alarm"), col("s.alarm_start"))
    val got = fin.collect().map(_.toSeq).toSet
    val want = run("audit_alert_hysteresis")
      .select("service", "audit_date", "audit_hour", "n",
        "enter_hot", "exit_cold", "alarm", "alarm_start")
      .collect().map(_.toSeq).toSet
    assert(got == want, "streaming hysteresis diverges from batch F25")
    // the stream actually alarms somewhere on this data, and every
    // alarm_start is an off->on edge of the served alarm sequence
    val byService = run("audit_alert_hysteresis")
      .select("service", "audit_date", "audit_hour", "alarm", "alarm_start")
      .collect().groupBy(_.getString(0))
    byService.foreach { case (_, rows) =>
      val ordered = rows.sortBy(r => (r.getString(1), r.getInt(2)))
      var prev = false
      ordered.foreach { r =>
        assert(r.getBoolean(4) == (r.getBoolean(3) && !prev))
        prev = r.getBoolean(3)
      }
    }
  }

  test("F21 streaming MAD detector converges to the batch robust-z verdicts") {
    val ms = MemoryStream[Event]
    val q = StreamOps.madState(ms.toDS(), spark)
      .writeStream.format("memory").queryName("s_mad")
      .outputMode("update").start()
    // three UNEVEN micro-batches; no sentinel — its far-future hour
    // would become a real series point of the dlq service
    val (a, rest) = batchEvents.splitAt(batchEvents.size / 4)
    val (b, c) = rest.splitAt(2 * rest.size / 3)
    ms.addData(a); q.processAllAvailable()
    ms.addData(b); q.processAllAvailable()
    ms.addData(c); q.processAllAvailable()
    q.stop()
    // median/MAD move as hours arrive: keep-latest by seen
    val t = spark.table("s_mad")
    val fin = t.groupBy("service", "audit_date", "audit_hour")
      .agg(max(struct(col("seen"), col("n"), col("med"), col("mad"),
        col("is_outlier"))).as("s"))
      .select(col("service"), col("audit_date"), col("audit_hour"),
        col("s.n"), col("s.med"), col("s.mad"), col("s.is_outlier"))
      .collect().map(_.toSeq).toSet
    val want = run("audit_mad_outliers").collect().map { r =>
      val ts = r.getAs[java.sql.Timestamp]("hour")
        .toInstant.atZone(java.time.ZoneOffset.UTC)
      Seq(r.getAs[String]("service"),
        ts.format(java.time.format.DateTimeFormatter.ISO_LOCAL_DATE),
        ts.getHour, r.getAs[Long]("n"), r.getAs[Long]("med"),
        r.getAs[Long]("mad"), r.getAs[Boolean]("is_outlier"))
    }.toSet
    assert(fin == want, "streaming MAD diverges from batch F21")
    assert(fin.nonEmpty)
  }

  test("F24 streaming changepoint locator converges to the batch argmax") {
    val ms = MemoryStream[Event]
    val q = StreamOps.changepointState(ms.toDS(), spark)
      .writeStream.format("memory").queryName("s_cp")
      .outputMode("update").start()
    // three UNEVEN micro-batches; no sentinel — its far-future hour
    // would become a real series point of the dlq service
    val (a, rest) = batchEvents.splitAt(batchEvents.size / 5)
    val (b, c) = rest.splitAt(rest.size / 2)
    ms.addData(a); q.processAllAvailable()
    ms.addData(b); q.processAllAvailable()
    ms.addData(c); q.processAllAvailable()
    q.stop()
    // the located split MOVES as data arrives: keep-latest by seen
    val t = spark.table("s_cp")
    val fin = t.groupBy("service")
      .agg(max(struct(col("seen"), col("split_date"), col("split_hour"),
        col("n_hours_before"), col("n_hours_after"),
        col("s_before"), col("s_after"), col("direction"))).as("s"))
      .select(col("service"), col("s.split_date"), col("s.split_hour"),
        col("s.n_hours_before"), col("s.n_hours_after"),
        col("s.s_before"), col("s.s_after"), col("s.direction"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getString(7))).toSeq.sortBy(_._1)
    val want = run("audit_changepoint").collect().map { r =>
      val ts = r.getAs[java.sql.Timestamp]("split_after")
        .toInstant.atZone(java.time.ZoneOffset.UTC)
      val k = r.getAs[Long]("n_hours_before")
      val ka = r.getAs[Long]("n_hours_after")
      // reconstruct the exact integer sums from the served means
      val sB = math.round(r.getAs[Double]("mean_before") * k)
      val sA = math.round(r.getAs[Double]("mean_after") * ka)
      (r.getAs[String]("service"),
        ts.format(java.time.format.DateTimeFormatter.ISO_LOCAL_DATE),
        ts.getHour, k, ka, sB, sA, r.getAs[String]("direction"))
    }.toSeq.sortBy(_._1)
    assert(fin == want, "streaming changepoint diverges from batch F24")
    assert(fin.nonEmpty && fin.map(_._1).toSet ==
      Set("ingest", "persist", "dlq"))
  }

  test("F26 streaming incident feed converges to the batch grouping") {
    val ms = MemoryStream[Event]
    // sf0.001 is too quiet for the default minN=5 volume guard — drive
    // both sides at minN=1, the batch F26 spec's convention
    val q = StreamOps.incidentState(ms.toDS(), spark, minN = 1L)
      .writeStream.format("memory").queryName("s_inc")
      .outputMode("update").start()
    // three UNEVEN micro-batches (arbitrary splits per the contract);
    // no sentinel — its event_type would route to the dlq service
    val (a, rest) = batchEvents.splitAt(batchEvents.size / 3)
    val (b, c) = rest.splitAt(rest.size / 4)
    ms.addData(a); q.processAllAvailable()
    ms.addData(b); q.processAllAvailable()
    ms.addData(c); q.processAllAvailable()
    q.stop()
    // incident ids are NOT stable across triggers (a later alarm hour
    // can merge two earlier islands): the final answer is the
    // max-`seen` emission SET per service — keep-latest semantics
    val t = spark.table("s_inc")
    val maxSeen = t.groupBy(col("service").as("msvc"))
      .agg(max("seen").as("mseen"))
    val fin = t.join(maxSeen,
      t("service") === col("msvc") && t("seen") === col("mseen"))
      .select(t("service"), col("incident_id"), col("start_date"),
        col("start_hour"), col("end_date"), col("end_hour"),
        col("span_hours"), col("n_alarm_hours"), col("n_pages"))
    val got = fin.collect().map(_.toSeq).toSet
    val want = operators.Audit.incidents(spark, sf, minN = 1L)
      .select("service", "incident_id", "start_date", "start_hour",
        "end_date", "end_hour", "span_hours", "n_alarm_hours", "n_pages")
      .collect().map(_.toSeq).toSet
    assert(got == want, "streaming incidents diverge from batch F26")
    assert(got.nonEmpty, "the replay produced no incidents at all")
  }

  test("D11 streaming OCC monitor converges to the batch conflict check") {
    val ms = MemoryStream[Event]
    val q = StreamOps.occState(ms.toDS(), spark)
      .writeStream.format("memory").queryName("s_occ")
      .outputMode("update").start()
    // three UNEVEN micro-batches in commit-log order (the contract);
    // no sentinel — the log has no watermark state to flush
    val (a, rest) = batchEvents.splitAt(batchEvents.size / 4)
    val (b, c) = rest.splitAt(rest.size / 3)
    ms.addData(a); q.processAllAvailable()
    ms.addData(b); q.processAllAvailable()
    ms.addData(c); q.processAllAvailable()
    q.stop()
    // a verdict can change while the attempt's own columns don't
    // (another writer commits into its window) — keep-latest by the
    // monotone global `seen` counter
    val fin = spark.table("s_occ")
      .groupBy("writer_id", "txn_date", "txn_hour")
      .agg(max(struct(col("seen"), col("start_us"), col("commit_us"),
        col("n_keys"), col("n_conflicts"), col("must_retry"),
        col("first_conflict_writer"))).as("s"))
      .select(col("writer_id"), col("txn_date"), col("txn_hour"),
        col("s.start_us"), col("s.commit_us"), col("s.n_keys"),
        col("s.n_conflicts"), col("s.must_retry"),
        col("s.first_conflict_writer"))
    val got = fin.collect().map(_.toSeq).toSet
    val want = run("persist_conflict_check")
      .select(col("writer_id"), col("txn_date"), col("txn_hour"),
        expr("unix_micros(start_ts)"), expr("unix_micros(commit_ts)"),
        col("n_keys"), col("n_conflicts"), col("must_retry"),
        col("first_conflict_writer"))
      .collect().map(_.toSeq).toSet
    assert(got == want, "streaming OCC monitor diverges from batch D11")
    // conflicts are live on this data, and never self-referential
    assert(got.exists(_(7) == true))
    assert(got.forall(r => r(8) == null || r(8) != r(0)))
  }

  test("F17 streaming EWMA monitor converges to the batch regression alarm") {
    val ms = MemoryStream[Event]
    val q = StreamOps.ewmaCounters(ms.toDS(), spark)
      .writeStream.format("memory").queryName("s_ewma")
      .outputMode("update").start()
    // no watermark state to flush — no sentinel (its event_type would
    // route to the dlq service and pollute that service's counters)
    val (first, second) = batchEvents.splitAt(batchEvents.size / 2)
    ms.addData(first); q.processAllAvailable()
    ms.addData(second); q.processAllAvailable()
    q.stop()
    // update mode re-emits every hour per trigger; all four counters
    // only grow, so the lexicographic max per hour = the final emission
    val fin = spark.table("s_ewma")
      .groupBy("service", "audit_date", "audit_hour")
      .agg(max(struct(col("n"), col("dur_sum"), col("ewma_num"),
        col("ewma_den"))).as("s"))
      .select(col("service"), col("audit_date"), col("audit_hour"),
        col("s.n"), col("s.dur_sum"), col("s.ewma_num"), col("s.ewma_den"))
    val got = fin.collect().map(_.toSeq).toSet
    val want = run("audit_ewma_alarm")
      .select("service", "audit_date", "audit_hour", "n", "dur_sum",
        "ewma_num", "ewma_den")
      .collect().map(_.toSeq).toSet
    assert(got == want, "streaming EWMA counters diverge from batch F17")
    // the alert projection derives from the streamed counters alone:
    // the same cross-multiplied flag reproduces the batch alarms
    val gotFlag = fin.select(col("service"), col("audit_date"),
        col("audit_hour"),
        (col("ewma_den") > 0 && col("n") >= 20L &&
          col("dur_sum").cast("decimal(38,0)") *
            col("ewma_den").cast("decimal(38,0)") >
          col("ewma_num").cast("decimal(38,0)") *
            (col("n") * 2).cast("decimal(38,0)"))
          .as("is_regression"))
      .collect().map(_.toSeq).toSet
    val wantFlag = run("audit_ewma_alarm")
      .select("service", "audit_date", "audit_hour", "is_regression")
      .collect().map(_.toSeq).toSet
    assert(gotFlag == wantFlag)
  }

  test("P2 streaming CDC consumer converges to the batch roundtrip state") {
    import graft.streaming.StreamOps.CdcRec
    // bootstrap load: the stored T1 snapshot, as full post-image records
    val base = graft.operators.Persist.cdcBase(spark, sf)
      .select("user_id", "event_type", "version", "n_deletes",
        "last_op", "last_value")
      .as[CdcRec].collect().toSeq
    // the tailed feed: non-noop change records (same post-image shape)
    val feed = graft.operators.Persist.cdcFeedOps(spark, sf)
      .filter(col("change_type") =!= "noop")
      .select("user_id", "event_type", "version", "n_deletes",
        "last_op", "last_value")
      .as[CdcRec].collect().toSeq
    val ms = MemoryStream[CdcRec]
    val q = StreamOps.cdcApplyState(ms.toDS(), spark)
      .writeStream.format("memory").queryName("s_cdc")
      .outputMode("update").start()
    ms.addData(base); q.processAllAvailable()
    ms.addData(feed); q.processAllAvailable()
    q.stop()
    // update mode: one row per touched key per trigger; the max-version
    // emission is the final reconstructed state
    val got = spark.table("s_cdc")
      .groupBy("user_id", "event_type")
      .agg(max(struct(col("version"), col("n_deletes"), col("last_op"),
        col("last_value"), col("is_purged"))).as("s"))
      .select(col("user_id"), col("event_type"), col("s.version"),
        col("s.n_deletes"), col("s.last_op"), col("s.last_value"),
        col("s.is_purged"))
      .collect().map(_.toSeq).toSet
    val want = run("pipeline_cdc_roundtrip")
      .select(col("user_id"), col("event_type"), col("version"),
        col("n_deletes"), col("last_op"), col("last_value"),
        col("is_purged"))
      .collect().map(_.toSeq).toSet
    assert(got == want, "streaming CDC consumer diverges from the batch roundtrip")
  }

  test("L4 streaming user state converges to the batch rollup") {
    val ms = MemoryStream[Event]
    val q = StreamOps.userLatestState(ms.toDS(), spark)
      .writeStream.format("memory").queryName("s_state")
      .outputMode("update").start()
    runStream(q, ms)
    // update mode emits one row per key per trigger: take the last
    val got = spark.table("s_state")
      .filter(col("user_id") =!= -1L)
      .groupBy("user_id")
      .agg(max(struct(col("n_events"), col("last_ts"), col("last_event_type"),
        col("last_value"))).as("s"))
      .select(col("user_id"), col("s.last_event_type"), col("s.last_ts"),
        col("s.last_value"), col("s.n_events"))
      .collect().map(_.toSeq).toSet
    val want = run("stream_user_latest_state")
      .select(col("user_id"), col("last_event_type"), col("last_ts"),
        col("last_value"), col("n_events"))
      .collect().map(_.toSeq).toSet
    assert(got == want)
  }

  test("L18 streaming Markov state sums to the batch transition counts") {
    val ms = MemoryStream[Event]
    val q = StreamOps.markovState(ms.toDS(), spark)
      .writeStream.format("memory").queryName("s_markov")
      .outputMode("update").start()
    runStream(q, ms)
    // per-user counts are monotone; merge the final (max-count) maps
    import org.apache.spark.sql.Row
    val finals = spark.table("s_markov").filter(col("user_id") =!= -1L)
      .select(col("user_id"), explode(col("transitions")).as(Seq("k", "v")))
      .groupBy("user_id", "k").agg(max("v").as("v"))
      .collect().map(r => (r.getString(1), r.getLong(2)))
    val got = finals.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      // the sentinel arrival appends one "<last> sentinel" transition
      // per active user — not part of the batch data; drop them
      .filterKeys(!_.endsWith(" sentinel")).toMap
    val want = run("events_markov").collect()
      .map(r => (r.getString(0) + " " + r.getString(1)) -> r.getLong(2)).toMap
    assert(got == want)
  }

  test("L24 streaming online features equal the offline batch snapshot exactly") {
    val ms = MemoryStream[Event]
    val q = StreamOps.featureSnapshotState(ms.toDS(), spark)
      .writeStream.format("memory").queryName("s_feat")
      .outputMode("append").start()
    runStream(q, ms)
    val got = spark.table("s_feat").filter(col("user_id") =!= -1L)
      .collect().map { r =>
        (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
          r.getAs[Long]("n_prior_events"),
          r.getAs[Long]("n_prior_purchases"),
          r.getAs[Double]("prior_purchase_value"),
          r.getAs[Long]("hours_active"),
          Option(r.getAs[java.lang.Long]("hours_since_prev_buy"))
            .map(_.longValue),
          r.getAs[Double]("label_value"))
      }.sortBy(_._1).toSeq
    val want = run("events_feature_snapshot").collect().map { r =>
      (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[Long]("n_prior_events"), r.getAs[Long]("n_prior_purchases"),
        r.getAs[Double]("prior_purchase_value"),
        r.getAs[Long]("hours_active"),
        if (r.isNullAt(6)) None
        else Some(r.getAs[Long]("hours_since_prev_buy")),
        r.getAs[Double]("label_value"))
    }.sortBy(_._1).toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("L26 streaming DiD cells equal the batch readout under micro-batch splits") {
    val cutoffUs = java.sql.Timestamp.valueOf("2024-01-15 00:00:00").getTime * 1000L
    val ms = MemoryStream[Event]
    val q = StreamOps.didCellState(ms.toDS(), spark, "exp1", cutoffUs)
      .writeStream.format("memory").queryName("s_did")
      .outputMode("update").start()
    runStream(q, ms)
    // n is monotone per cell: the max-n update is the final state
    val wKey = org.apache.spark.sql.expressions.Window
      .partitionBy(col("treated"), col("post")).orderBy(col("n").desc)
    val cells = spark.table("s_did")
      .withColumn("rn", row_number().over(wKey)).filter(col("rn") === 1)
      .collect().map(r => (r.getBoolean(0), r.getBoolean(1)) ->
        (r.getLong(2), BigDecimal(r.getString(3)))).toMap
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def mean(t: Boolean, p: Boolean): Double = {
      val (n, s) = cells((t, p)); s.toDouble / n
    }
    val row = run("events_did").collect().head
    assert(cells((false, false))._1 == row.getAs[Long]("n_c_pre"))
    assert(cells((false, true))._1 == row.getAs[Long]("n_c_post"))
    assert(cells((true, false))._1 == row.getAs[Long]("n_t_pre"))
    assert(cells((true, true))._1 == row.getAs[Long]("n_t_post"))
    assert(r6(mean(t = true, p = true)) == row.getAs[Double]("mean_t_post"))
    assert(r6(mean(t = false, p = false)) == row.getAs[Double]("mean_c_pre"))
    // the estimate is a pure function of the emitted cells
    assert(r6((mean(t = true, p = true) - mean(t = true, p = false)) -
      (mean(t = false, p = true) - mean(t = false, p = false))) ==
      row.getAs[Double]("did"))
  }

  test("L22 streaming gap statistics reduce to the batch burstiness exactly") {
    val ms = MemoryStream[Event]
    val q = StreamOps.gapStatsState(ms.toDS(), spark)
      .writeStream.format("memory").queryName("s_gaps")
      .outputMode("update").start()
    runStream(q, ms)
    // n is monotone per key: the max-n update is the final state
    val wKey = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"), col("user_id"))
      .orderBy(col("n_gaps").desc)
    val fin = spark.table("s_gaps")
      .filter(col("event_type") =!= "sentinel")
      .withColumn("rn", row_number().over(wKey))
      .filter(col("rn") === 1)
      .collect().map(r => (r.getString(0), r.getLong(2),
        BigInt(r.getString(3)), BigInt(r.getString(4))))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = fin.groupBy(_._1).map { case (typ, ks) =>
      val n = ks.map(_._2).sum
      val s1 = ks.map(_._3).sum
      val s2 = ks.map(_._4).sum
      val m = s1.toDouble / n
      val sd = math.sqrt(s2.toDouble / n - m * m)
      typ -> (n, r6(m / 1000000.0), r6(sd / 1000000.0),
        r6((sd - m) / (sd + m)))
    }
    val want = run("events_burstiness").collect().map { r =>
      r.getString(0) -> (r.getAs[Long]("n_gaps"),
        r.getAs[Double]("mean_gap_sec"), r.getAs[Double]("std_gap_sec"),
        r.getAs[Double]("burstiness"))
    }.toMap
    assert(got == want)
  }

  test("L14 streaming attribution counters converge to the batch per-channel counts") {
    val ms = MemoryStream[Event]
    val q = StreamOps.attributionState(ms.toDS(), spark)
      .writeStream.format("memory").queryName("s_attr")
      .outputMode("update").start()
    runStream(q, ms)
    // counters are monotone per user: the max update is the final state
    val fin = spark.table("s_attr").filter(col("user_id") =!= -1L)
      .groupBy("user_id")
      .agg(max("last_click").as("lc"), max("last_view").as("lv"),
        max("last_none").as("ln"), max("first_click").as("fc"),
        max("first_view").as("fv"), max("first_none").as("fn"))
      .agg(sum("lc"), sum("lv"), sum("ln"), sum("fc"), sum("fv"), sum("fn"))
      .head()
    val got = Map(
      ("last_touch", "click") -> fin.getLong(0),
      ("last_touch", "view") -> fin.getLong(1),
      ("last_touch", "none") -> fin.getLong(2),
      ("first_touch", "click") -> fin.getLong(3),
      ("first_touch", "view") -> fin.getLong(4),
      ("first_touch", "none") -> fin.getLong(5))
    val want = run("events_attribution").collect().map { r =>
      (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_purchases")
    }.toMap
    assert(got.filter(_._2 > 0) == want.filter(_._2 > 0))
  }

  test("L11 streaming funnel state matches the batch funnel per tenant") {
    val ms = MemoryStream[Event]
    val q = StreamOps.funnelState(ms.toDS(), spark)
      .writeStream.format("memory").queryName("s_funnel")
      .outputMode("update").start()
    runStream(q, ms)
    // stages_completed is monotone per user: the max update is final
    val finalPerUser = spark.table("s_funnel")
      .filter(col("user_id") =!= -1L)
      .groupBy("user_id").agg(max("stages_completed").as("sc"))
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Int]("sc")))
    val gotCounts = finalPerUser.groupBy(t => "t" + (t._1 % 4))
      .map { case (ten, us) =>
        ten -> (0 to 3).map(i => us.count(_._2 >= i).toLong) }
    run("events_funnel").collect().foreach { r =>
      val ten = r.getAs[String]("tenant_id")
      val want = Seq(r.getAs[Long]("n_users"), r.getAs[Long]("n_s0_view"),
        r.getAs[Long]("n_s1_click"), r.getAs[Long]("n_s2_purchase"))
      assert(gotCounts(ten) == want, s"tenant $ten")
    }
  }

  test("D13 ivm streaming twin: foreachBatch delta-merge equals batch under arbitrary splits") {
    import org.apache.spark.sql.types.{DecimalType, LongType, StructField, StructType}
    val ords = Tables.orders(spark, sf)
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .as[(Long, Double, Double)].collect().toSeq
    val ms = MemoryStream[(Long, Double, Double)]
    val schema = StructType(Seq(StructField("o_custkey", LongType),
      StructField("rev", DecimalType(18, 6)), StructField("n_lines", LongType)))
    var state = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val q = ms.toDF()
      .toDF("l_orderkey", "l_extendedprice", "l_discount")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // the delta-merge consumer: state ⊎ fold(Δ ⋈ orders); the
        // localCheckpoint is the spec-scale stand-in for the MERGE
        // target write a real deployment commits per batch
        state = StreamOps.ivmDeltaMerge(state, batch, ords).localCheckpoint()
        ()
      }
      .outputMode("update").start()
    // deliberately uneven micro-batch splits (1, 3, rest/2, remainder)
    val cuts = Seq(1, 4, 4 + (li.size - 4) / 2, li.size)
    var prev = 0
    for (c <- cuts) {
      ms.addData(li.slice(prev, c)); q.processAllAvailable(); prev = c
    }
    q.stop()
    val got = StreamOps.ivmServe(state).collect().map(_.toSeq).toSet
    val want = run("persist_ivm_join").collect().map(_.toSeq).toSet
    assert(got == want,
      "foreachBatch delta-merge diverges from the batch join view")
  }
}
