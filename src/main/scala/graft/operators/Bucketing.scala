package graft.operators

import org.apache.spark.sql.DataFrame

/** Bucketed-layout helpers: the storage-side half of the scale story.
  *
  * At 100 TB the persist store and the observation stream are written
  * bucketed (and sorted) by the entity key; every downstream
  * entity-keyed operation — the idempotent upsert windows, latest-
  * observation, sessionization, patient-timeline joins — then reads
  * co-located buckets and needs NO shuffle at all (BucketingSpec
  * pins the shuffle-free plan). This is the DynamoDB-partition-key
  * analogue of the reference's single-table design (reference:
  * src/stacks/data-stack.ts PK/GSI layout).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted table on `key`. Joins and
    * aggregations on `key` between tables bucketed with the same
    * bucket count read bucket-to-bucket. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }
}
