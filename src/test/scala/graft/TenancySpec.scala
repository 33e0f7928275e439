package graft

import org.apache.spark.sql.functions._

import graft.operators.QueryApi

/** Tenant-isolation contract over the Query-API family: the reference
  * keys every read by the auth-claim tenant
  * (services/api-query/src/handler.ts:16-20, :43-44 —
  * `TENANT#<t>#PATIENT#<p>`), so no call can ever observe another
  * tenant's rows. Asserted here structurally for every E-operator:
  * a mismatched (tenant, patient) pair is a key miss (empty set), and
  * tenant-scoped set results only ever contain the requested tenant.
  */
class TenancySpec extends SparkSpecBase {

  // patient 13 lives in t1 (13 % 4 = 1); t2/t3/t0 are the wrong doors
  test("patient-scoped reads under a mismatched tenant are key misses") {
    assert(QueryApi.getPatient(spark, sf, tenant = "t2", patient = 13L).count() == 0)
    assert(QueryApi.obsByPatient(spark, sf, tenant = "t2").count() == 0)
    assert(QueryApi.obsPageAfter(spark, sf, tenant = "t3").count() == 0)
    assert(QueryApi.limitClamp(spark, sf, tenant = "t2").count() == 0)
    assert(QueryApi.nextToken(spark, sf, tenant = "t0").count() == 0)
  }

  test("tenant-scoped set queries contain only the requested tenant") {
    for (t <- Seq("t0", "t1", "t2", "t3")) {
      val m = t.drop(1).toInt
      val latest = QueryApi.latestObservation(spark, sf, tenant = t)
      assert(latest.filter(pmod(col("user_id"), lit(4)) =!= m).count() == 0,
        s"latestObservation($t) leaked a foreign patient")
      val asof = QueryApi.obsAsofJoin(spark, sf, tenant = t)
      assert(asof.filter(pmod(col("user_id"), lit(4)) =!= m).count() == 0,
        s"obsAsofJoin($t) leaked a foreign patient")
      val batch = QueryApi.multiGet(spark, sf, tenant = t,
        probes = QueryApi.defaultProbes)
      assert(batch.filter(pmod(col("user_id"), lit(4)) =!= m).count() == 0,
        s"multiGet($t) leaked a foreign patient")
    }
  }

  test("the four tenant slices partition the all-tenant latest result") {
    val perTenant = Seq("t0", "t1", "t2", "t3")
      .map(t => QueryApi.latestObservation(spark, sf, tenant = t).count()).sum
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val allTenants = Tables.events(spark, sf)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).count()
    assert(perTenant == allTenants,
      s"tenant slices ($perTenant) do not partition the keyspace ($allTenants)")
  }

  test("a cross-tenant batch probe is a key miss, not a leak") {
    // patient 6 (t2) probed through t1's batch: BatchGetItem under
    // the caller's tenant constructs TENANT#t1#PATIENT#6 — no row
    val batch = QueryApi.multiGet(spark, sf, tenant = "t1",
      probes = Seq((13L, "purchase"), (6L, "purchase")))
    assert(batch.filter(col("user_id") === 6L).count() == 0)
    assert(batch.filter(col("user_id") === 13L).count() == 1)
    // same probes through the right door: patient 6 answers
    val home = QueryApi.multiGet(spark, sf, tenant = "t2",
      probes = Seq((13L, "purchase"), (6L, "purchase")))
    assert(home.filter(col("user_id") === 6L).count() == 1)
    assert(home.filter(col("user_id") === 13L).count() == 0)
  }

  test("E11 bundle agrees with its component resolvers; wrong tenant is a key miss") {
    import org.apache.spark.sql.functions.col
    val b = QueryApi.patientBundle(spark, sf).collect()
    assert(b.length == 1)
    val r = b.head
    // profile fields = getPatient's row
    val p = QueryApi.getPatient(spark, sf).collect().head
    for (c <- Seq("name", "birth_date", "version", "segment", "balance"))
      assert(r.getAs[Any](c) == p.getAs[Any](c), s"bundle field $c diverges")
    // latest purchase = E3's row for (13, purchase)
    val latest = QueryApi.latestObservation(spark, sf)
      .filter(col("user_id") === 13L && col("event_type") === "purchase")
      .collect()
    if (latest.nonEmpty) {
      assert(r.getAs[java.sql.Timestamp]("latest_obs_ts") ==
        latest.head.getAs[java.sql.Timestamp]("ts"))
      assert(r.getAs[Double]("latest_obs_value") ==
        latest.head.getAs[Double]("value"))
    } else assert(r.isNullAt(r.fieldIndex("latest_obs_ts")))
    // the count field matches a direct recount
    val n = Tables.events(spark, sf)
      .filter(col("user_id") === 13L && col("event_type") === "purchase" &&
        col("ts") >= "2024-01-01 00:00:00" && col("ts") < "2024-02-01 00:00:00")
      .count()
    assert(r.getAs[Long]("n_obs_window") == n)
    // wrong door: no row, not a leak
    assert(QueryApi.patientBundle(spark, sf, tenant = "t2").count() == 0)
  }

  test("E17 authz scope: admin override sees every slice, members exactly one") {
    val out = QueryApi.authzScope(spark, sf).collect()
    val byCaller = out.groupBy(_.getString(0))
    // the admin's override (isAdmin || claim = tenant) opens all 4 doors
    assert(byCaller("root").map(_.getString(3)).sorted.toSeq ==
      Seq("t0", "t1", "t2", "t3"))
    // every member sees exactly their claim tenant's slice
    for ((caller, home) <- Seq("alice" -> "t1", "bob" -> "t2",
        "carol" -> "t3", "dana" -> "t0")) {
      val rows = byCaller(caller)
      assert(rows.length == 1 && rows.head.getString(3) == home,
        s"$caller must see exactly the $home slice")
    }
    // partition law: the admin's visible observations are exactly the
    // union of the four members' slices, and exactly the whole stream
    val adminN = byCaller("root").map(_.getLong(4)).sum
    val memberN = out.filter(r => !r.getBoolean(2)).map(_.getLong(4)).sum
    assert(adminN == memberN)
    assert(adminN == Tables.events(spark, sf).count())
  }

  test("E18 field mask: pii clearance gates columns, E17 scope gates rows") {
    val out = QueryApi.fieldMask(spark, sf).collect()
    for (r <- out) {
      val (caller, admin, pii) =
        (r.getString(0), r.getBoolean(1), r.getBoolean(2))
      val (tenant, patient) = (r.getString(3), r.getLong(4))
      val (name, birth) = (r.getString(5), r.getDate(6))
      // row scope is E17's law
      val claim = QueryApi.maskPrincipals.find(_._1 == caller).get._2
      assert(admin || claim == tenant, s"$caller leaked a $tenant row")
      if (pii) {
        assert(name == s"patient-$patient", s"$caller: raw name expected")
      } else {
        assert(name.startsWith("masked:") && !name.contains("patient"),
          s"$caller: PII served without clearance")
        // generalized to year: month/day suppressed
        assert(birth.toString.endsWith("-01-01"),
          s"$caller: birth date not generalized ($birth)")
      }
    }
    // the pseudonym is STABLE (tokenization, not suppression): the same
    // patient masks to the same token for every uncleared caller
    val toks = out.filter(r => !r.getBoolean(2))
      .groupBy(_.getLong(4)).values
    assert(toks.forall(rs => rs.map(_.getString(5)).toSet.size == 1))
  }

  test("A4 presign route: claim-parse classes, tenant defaulting, misroute law") {
    val out = operators.Ingest.presignRoute(spark, sf).cache()
    val rows = out.collect()
    assert(rows.nonEmpty)
    val i = out.columns.zipWithIndex.toMap
    for (r <- rows) {
      val fmt = r.getString(i("groups_fmt"))
      val (nGroups, admin) = (r.getInt(i("n_groups")), r.getBoolean(i("is_admin")))
      val (claimT, bodyT) = (Option(r.getString(i("claim_tenant"))),
        Option(r.getString(i("body_tenant"))))
      val tenant = Option(r.getString(i("tenant_id")))
      val decision = r.getString(i("decision"))
      // 1. claims parse is TOTAL over the three arrival shapes, and
      //    the parsed size matches each shape's group list
      assert(Set("array", "csv", "absent")(fmt))
      if (fmt == "absent") assert(nGroups == 0 && !admin)
      else assert(nGroups == (if (admin) 2 else 1),
        s"$fmt parse lost groups: n=$nGroups admin=$admin")
      // 2. tenant defaulting: body ?? claims; both absent -> 400
      assert(tenant == bodyT.orElse(claimT))
      if (tenant.isEmpty) assert(decision == "reject_400")
      // 3. authz is the JS !== law: non-admin + claim != requested -> 403
      if (tenant.nonEmpty)
        assert((decision == "granted") == (admin || claimT == tenant),
          s"decision $decision admin=$admin claim=$claimT tenant=$tenant")
      // 4. granted keys are ALWAYS .json; misroute flags disagreement
      if (decision == "granted") {
        assert(r.getString(i("upload_key_suffix")) == "json")
        assert(r.getString(i("routed_ct")) == "application/json")
        assert(r.getBoolean(i("misroute")) ==
          (r.getString(i("requested_ct")) != "application/json"))
      } else assert(r.get(i("upload_key_suffix")) == null &&
        r.get(i("routed_ct")) == null && !r.getBoolean(i("misroute")))
    }
    // every class actually occurs in the corpus (the synth laws cover
    // all branches): 3 parse shapes x both admin values, 400s, 403s,
    // and real misrouted grants (an HL7/CSV presign landing as .json)
    def n(p: org.apache.spark.sql.Row => Boolean) = rows.count(p)
    assert(Seq("array", "csv", "absent")
      .forall(f => n(_.getString(i("groups_fmt")) == f) > 0))
    assert(n(_.getBoolean(i("is_admin"))) > 0)
    assert(n(_.getString(i("decision")) == "reject_400") > 0)
    assert(n(_.getString(i("decision")) == "reject_403") > 0)
    assert(n(_.getBoolean(i("misroute"))) > 0)
    // zero-shuffle pin: pure casewise scan-project
    assert(!flattenPlan(executedPlan(out)).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]),
      "presign route must not shuffle")
    out.unpersist()
  }

  test("getPatient serves the META row of the D5 profile upsert") {
    val row = QueryApi.getPatient(spark, sf, tenant = "t1", patient = 13L)
      .collect()
    assert(row.length == 1)
    val r = row.head
    assert(r.getAs[String]("name") == "patient-13")
    assert(r.getAs[Long]("version") >= 1L)
    // registry attributes joined from the customer table
    assert(r.getAs[String]("segment") != null)
  }
}
