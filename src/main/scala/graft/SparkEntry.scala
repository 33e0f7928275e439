package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-slice operator registries. Every query key in
  * `queries` has either a DuckDB oracle in `oracleSql` (hash-compared
  * by the driver) or is a documented rows-only op (non-SQL-expressible
  * semantics; covered by ScalaTest specs instead).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    Engine.configure(spark)
    operators.Analytics.q1PricingSummary(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Analytics.queries ++
      operators.QueryApi.queries ++
      operators.Persist.queries ++
      operators.Ingest.queries ++
      operators.Audit.queries ++
      operators.Dedup.queries ++
      operators.TextAnalysis.queries ++
      operators.Similarity.queries ++
      sources.Adapters.queries ++
      operators.Normalize.queries ++
      operators.EventStream.queries ++
      operators.Multimodal.queries ++
      operators.Corpus.queries ++
      operators.Skew.queries ++
      operators.Bucketing.queries ++
      operators.Graph.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys are rows-only ops. */
  def oracleSql: Map[String, String] =
    operators.Analytics.oracles ++
      operators.QueryApi.oracles ++
      operators.Persist.oracles ++
      operators.Ingest.oracles ++
      operators.Audit.oracles ++
      operators.Dedup.oracles ++
      operators.TextAnalysis.oracles ++
      operators.Similarity.oracles ++
      sources.Adapters.oracles ++
      operators.Normalize.oracles ++
      operators.EventStream.oracles ++
      operators.Multimodal.oracles ++
      operators.Corpus.oracles ++
      operators.Skew.oracles ++
      operators.Bucketing.oracles ++
      operators.Graph.oracles
}
