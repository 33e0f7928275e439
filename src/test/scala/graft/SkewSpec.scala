package graft

import org.apache.spark.sql.functions._

/** Salting rewrites must be result-equal to their unsalted forms, and
  * the shuffle key must actually include the salt. */
class SkewSpec extends SparkSpecBase {

  // heavily skewed stream: ~90% of events collapse onto user 0
  private lazy val skewed = Tables.events(spark, sf)
    .withColumn("user_id", when(col("user_id") < 135, 0L).otherwise(col("user_id")))

  test("salted join equals plain join on skewed data") {
    val dims = skewed.select("user_id").distinct()
      .withColumn("dim_attr", concat(lit("u"), col("user_id")))
    val plain = skewed.join(dims, "user_id")
      .select("event_id", "user_id", "dim_attr")
    val salted = operators.Skew.saltedJoin(skewed, dims, "user_id", 8)
      .select("event_id", "user_id", "dim_attr")
    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
  }

  test("salted join shuffles on (key, salt)") {
    val dims = skewed.select("user_id").distinct()
    val df = operators.Skew.saltedJoin(skewed, dims, "user_id", 8)
    // disable broadcast so the join actually shuffles, then inspect
    val p = df.queryExecution.sparkPlan.toString
    assert(p.contains("__salt"))
  }

  test("served salted rollup: exactly two shuffles, first keyed by (key, salt)") {
    val df = run("skew_salted_rollup")
    val exch = flattenPlan(executedPlan(df)).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exch.size == 2, s"expected phase-1 and phase-2 shuffles, got ${exch.size}")
    assert(exch.exists(_.outputPartitioning.toString.contains("__salt")),
      "phase-1 shuffle must be keyed by (key, __salt)")
  }

  test("N5 served salted join: plan is a salted SortMergeJoin, result matches") {
    val df = run("skew_salted_join")
    val nodes = flattenPlan(executedPlan(df))
    val smj = nodes.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    assert(smj.nonEmpty, "MERGE hint must keep the join a SortMergeJoin")
    assert(smj.exists(_.leftKeys.map(_.toString).exists(_.contains("__salt"))),
      "SMJ keys must include the salt")
    // every event routes to exactly one service: totals conserve
    assert(df.agg(sum("n")).head().getLong(0) ==
      Tables.events(spark, sf).count())
  }

  test("N6 range bin join equals the naive non-equi join, incl. overlap multi-match") {
    val binned = run("range_bin_join").cache()
    val naive = Tables.events(spark, sf)
      .crossJoin(broadcast(operators.Skew.windowsDf(spark)))
      .filter(col("ts") >= col("w_start") && col("ts") < col("w_end"))
      .select("window_id", "event_id", "user_id", "ts", "value")
    assert(binned.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(binned).count() == 0)
    // the overlapping windows really produce multi-matches: some event
    // appears under both w6 and w7
    val multi = binned.groupBy("event_id").agg(countDistinct("window_id").as("nw"))
      .filter(col("nw") >= 2)
    assert(multi.count() > 0, "no event matched two overlapping windows")
    // the empty window yields nothing
    assert(binned.filter(col("window_id") === "w3").count() == 0)
    binned.unpersist(): Unit
  }

  test("N8 bloom prefilter: equal to the plain join, and actually reduces the scan") {
    val bloomed = run("join_bloom_prefilter")
    val ords = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_orderdate"))
    val plain = Tables.lineitem(spark, sf)
      .join(ords, col("l_orderkey") === col("o_orderkey"))
      .groupBy(date_trunc("month", col("o_orderdate")).as("order_month"))
      .agg(count(lit(1)).as("n_lines"),
        operators.Analytics.dsum(
          col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
    assert(bloomed.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(bloomed).count() == 0)
    // the point of the exercise: the bloom drops the vast majority of
    // the big side BEFORE the join's exchange. The build side is ~2%
    // of orders; with fpp ≪ 1 the pre-join survivor fraction must be
    // well under 10% of lineitem, and (no false negatives) at least
    // every truly-matching row must survive.
    val full = Tables.lineitem(spark, sf).count()
    val surviving = operators.Skew.prefilteredLineitem(spark, sf).count()
    val matching = Tables.lineitem(spark, sf)
      .join(ords, col("l_orderkey") === col("o_orderkey")).count()
    assert(surviving >= matching, "bloom dropped a matching row")
    assert(surviving < full / 10,
      s"bloom kept $surviving of $full — filter not selective on this fixture")
  }

  test("salted aggregation equals plain aggregation") {
    val plain = skewed.groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 100))).toSet
    val salted = operators.Skew.saltedCountSum(skewed, "user_id", "value", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 100))).toSet
    assert(plain == salted)
  }
}
