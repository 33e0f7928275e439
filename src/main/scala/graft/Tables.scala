package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed loaders for the driver-provided testdata tables.
  *
  * `events` plays the observation stream of the reference
  * (services/ingest -> normalize -> persist): user_id ~ patientId,
  * event_type ~ LOINC-ish code, value ~ observation value, ts ~
  * effectiveDateTime, props ~ raw JSON payload. `customer` plays the
  * patient registry; `documents`/`embeddings` feed the LLM-pipeline
  * operators; TPC-H tables exercise the relational/scale paths.
  */
object Tables {
  private def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  val all: Seq[String] = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")
}
