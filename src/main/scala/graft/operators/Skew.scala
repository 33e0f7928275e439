package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
