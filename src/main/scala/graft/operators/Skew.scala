package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Skew mitigation for hot keys (SURVEY §4).
  *
  * AQE's skew-join splitting handles sort-merge joins at runtime, but
  * two cases still need manual salting on a real cluster: broadcast-
  * ineligible joins planned before stats exist, and aggregations
  * (AQE never splits a skewed groupBy key). Both helpers are pure
  * plan rewrites — results are exactly equal to the unsalted form
  * (SkewSpec asserts set equality).
  */
object Skew {

  /** Deterministic per-row salt (hash of the given columns mod n) —
    * no rand(), so retries/replays see identical salts. */
  private def saltOf(n: Int, cols: Seq[Column]): Column =
    pmod(hash(cols: _*), lit(n))

  /** Salted inner equi-join: the big (skewed) side is split into n
    * salt shards per key; the small side is replicated n ways. The
    * shuffle key becomes (key, salt), so a hot key spreads across n
    * reducers instead of melting one. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, n: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      saltOf(n, big.columns.map(c => big(c)).toSeq))
    val replicatedSmall = small.withColumn("__salt",
      explode(array((0 until n).map(lit): _*)))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase salted aggregation: count + sum per key. Phase 1
    * reduces (key, salt) shards map-side; phase 2 merges the n shard
    * rows per key — the second shuffle moves only n rows per key
    * regardless of skew.
    *
    * NOTE: double sums change their addition order under salting
    * (observed: same hot key, |delta| ~1e-9 relative) — for hash-exact
    * results route the value through decimal first (Analytics.dsum),
    * exactly like every oracle-checked query does. */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String, n: Int): DataFrame =
    df.withColumn("__salt", saltOf(n, df.columns.map(c => df(c)).toSeq))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(col(key))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("total"))

  /** Served `skew_salted_rollup` — the two-phase salted count+sum
    * over events keyed by event_type: 5 hot keys across the whole
    * table, exactly the shape AQE never splits (it splits skewed
    * JOINS, not skewed groupBys). The value routes through
    * decimal(18,6) (Analytics.dsum discipline) so decimal addition
    * is exact and order-insensitive — the salted two-phase result is
    * hash-equal to the plain single-phase rollup, which is what the
    * DuckDB oracle computes. Phase 2 moves only n salt-shard rows
    * per key regardless of how hot the key is. */
  def saltedRollup(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .withColumn("v", col("value").cast("decimal(18,6)"))
    saltedCountSum(ev, "event_type", "v", 16)
      .select(col("event_type"), col("n"),
        col("total").cast("double").as("total_value"))
  }

  def saltedRollupSql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "skew_salted_rollup" -> (saltedRollup _))

  val oracles: Map[String, String] = Map(
    "skew_salted_rollup" -> saltedRollupSql)
}
