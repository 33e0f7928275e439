package graft

import org.apache.spark.sql.DataFrame

import graft.operators.{Analytics, QueryApi}

/** Parameterized-API contract: every operator is a library function,
  * not a pinned query — calling it with NON-default parameters must
  * agree with the SAME parameterized SQL builder that feeds the
  * driver's DuckDB oracle. Here the builder SQL runs through Spark
  * SQL over temp views (an independent execution path: SQL parser +
  * analyzer vs the DataFrame API), so a literal that failed to thread
  * through either side breaks the equality. The DuckDB side of the
  * same builders is covered by the param_* registry keys the driver
  * hash-checks.
  */
class ParamSpec extends SparkSpecBase {

  private def ensureViews(): Unit = {
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events"))
      Tables.byName(spark, sf, t).createOrReplaceTempView(t)
  }

  /** Rows sorted by their full string rendering — exact equality is
    * legitimate because every aggregate in these operators goes
    * through the exact-decimal discipline (same bits either path). */
  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toIndexedSeq
    df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect().map(_.toString).sorted.toIndexedSeq
  }

  private def assertAgrees(df: DataFrame, sql: String, label: String): Unit = {
    ensureViews()
    val viaApi = canon(df)
    // The oracles route decimal-sum serves through VARCHAR so DuckDB's
    // string→double (correctly rounded) replaces its 1-ulp-off native
    // decimal→double cast (SCALING_r09.md §1). Spark's parser requires
    // a length on VARCHAR; STRING is its exact equivalent and Spark's
    // decimal→string→double is correctly rounded the same way.
    // The rewrite applies only OUTSIDE single-quoted string literals
    // (segments at even index after splitting on '), so a future literal
    // that happens to contain "AS VARCHAR)" can never be rewritten
    // silently — only genuine cast type tokens are touched.
    val rewritten = sql.split("'", -1).zipWithIndex.map { case (seg, i) =>
      if (i % 2 == 0) seg.replace("AS VARCHAR)", "AS STRING)") else seg
    }.mkString("'")
    val viaSql = canon(spark.sql(rewritten))
    assert(viaApi == viaSql,
      s"$label: DataFrame API and parameterized SQL disagree " +
        s"(${viaApi.length} vs ${viaSql.length} rows; " +
        s"first API row ${viaApi.headOption}, first SQL row ${viaSql.headOption})")
    assert(viaApi.nonEmpty, s"$label: parameter choice returned no rows")
  }

  test("q1 with a non-default shipdate cutoff") {
    assertAgrees(
      Analytics.q1PricingSummary(spark, sf, shipdateMax = "1996-06-30"),
      Analytics.q1Sql(shipdateMax = "1996-06-30"), "q1(1996-06-30)")
  }

  test("q6 with non-default year, discount band, and quantity cap") {
    assertAgrees(
      Analytics.q6ForecastRevenue(spark, sf,
        from = "1995-01-01", to = "1996-01-01",
        discLo = 0.02, discHi = 0.07, qtyMax = 40),
      Analytics.q6Sql(from = "1995-01-01", to = "1996-01-01",
        discLo = 0.02, discHi = 0.07, qtyMax = 40), "q6(1995, wide)")
  }

  test("q3 with a non-default segment and cutoff") {
    assertAgrees(
      Analytics.q3ShippingPriority(spark, sf,
        segment = "AUTOMOBILE", date = "1997-01-01", limit = 12),
      Analytics.q3Sql(segment = "AUTOMOBILE", date = "1997-01-01", limit = 12),
      "q3(AUTOMOBILE)")
  }

  test("k18 with a different nation pair") {
    assertAgrees(
      Analytics.k18NationTradeVolume(spark, sf,
        nationA = "NATION_11", nationB = "NATION_20"),
      Analytics.k18Sql(nationA = "NATION_11", nationB = "NATION_20"),
      "k18(N11,N20)")
  }

  test("k21 with a different excluded brand") {
    assertAgrees(
      Analytics.k21SupplierVariety(spark, sf, excludedBrand = "Brand#11"),
      Analytics.k21Sql(excludedBrand = "Brand#11"), "k21(!Brand#11)")
  }

  test("obsByPatient with non-default tenant/patient/code/window") {
    assertAgrees(
      QueryApi.obsByPatient(spark, sf, tenant = "t3", patient = 7L,
        code = "view", from = "2024-01-01 00:00:00",
        to = "2024-01-31 00:00:00", limit = 40),
      QueryApi.obsByPatientSql(tenant = "t3", patient = 7L,
        code = "view", from = "2024-01-01 00:00:00",
        to = "2024-01-31 00:00:00", limit = 40), "obsByPatient(t3,7,view)")
  }

  test("latestObservation for each tenant") {
    for (t <- Seq("t0", "t2")) {
      assertAgrees(
        QueryApi.latestObservation(spark, sf, tenant = t),
        QueryApi.latestObservationSql(tenant = t), s"latestObservation($t)")
    }
  }

  test("obsByCode with non-default tenant/code/window") {
    assertAgrees(
      QueryApi.obsByCode(spark, sf, tenant = "t0", code = "click",
        from = "2024-01-03 00:00:00", to = "2024-01-15 00:00:00", limit = 15),
      QueryApi.obsByCodeSql(tenant = "t0", code = "click",
        from = "2024-01-03 00:00:00", to = "2024-01-15 00:00:00", limit = 15),
      "obsByCode(t0, click)")
  }
}
