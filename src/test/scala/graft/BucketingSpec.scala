package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located joins: the storage layout that removes the
  * shuffle from every entity-keyed operation (SURVEY §4). */
class BucketingSpec extends SparkSpecBase {

  test("join of two tables bucketed on the key runs with zero shuffles") {
    val ev = Tables.events(spark, sf)
    operators.Bucketing.writeBucketed(
      ev.select("event_id", "user_id", "event_type", "value"),
      "events_bucketed", "user_id", 8, Seq("user_id"))
    operators.Bucketing.writeBucketed(
      ev.groupBy("user_id").agg(count(lit(1)).as("n")),
      "user_counts_bucketed", "user_id", 8, Seq("user_id"))

    val joined = spark.table("events_bucketed")
      .join(spark.table("user_counts_bucketed"), "user_id")
    val shuffles = flattenPlan(executedPlan(joined)).count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])
    assert(shuffles == 0, s"bucketed join should not shuffle, got $shuffles")
    assert(joined.count() == ev.count())
  }

  test("served bucketed upsert: same results as flat D2, zero Exchange") {
    val bucketed = run("persist_upsert_bucketed")
    val flat = run("persist_upsert_version")
    assert(bucketed.except(flat).count() == 0 && flat.except(bucketed).count() == 0)
    // the whole windowed upsert reads co-located buckets: no shuffle
    val shuffles = flattenPlan(executedPlan(bucketed)).count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])
    assert(shuffles == 0, s"bucketed upsert should not shuffle, got $shuffles")
  }

  test("aggregation on the bucket key needs no exchange") {
    val agg = spark.table("events_bucketed")
      .groupBy("user_id").agg(sum("value").as("total"))
    val shuffles = flattenPlan(executedPlan(agg)).count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])
    assert(shuffles == 0, s"bucketed agg should not shuffle, got $shuffles")
  }
}
