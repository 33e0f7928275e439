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
