package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column plumbing (SURVEY §2.J): media as opaque binary
  * columns with typed metadata, and a batched decode/feature-extract
  * stage.
  *
  * The decode itself is a STUB (image/audio codecs are not in this
  * environment): a deterministic fake that derives per-chunk byte
  * statistics. Everything around it is the real production shape —
  * binary column + metadata struct schema, partition-friendly layout,
  * mapPartitions with explicit batching (the Scala analogue of a
  * batched pandas-UDF decode: amortizes per-batch codec init, keeps
  * memory bounded by batch size, preserves partition parallelism).
  */
object Multimodal {

  case class MediaFeatures(doc_id: Long, n_bytes: Int, batch_size: Int,
      features: Array[Float])

  /** J1 — the media table schema: opaque binary + typed metadata.
    * Synth: the document text bytes stand in for an image payload. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      col("text").cast("binary").as("media"),
      struct(
        col("n_chars").as("width"),
        lit(1).as("height"),
        lit("text/fake").as("format"),
        col("source").as("origin")).as("meta"))

  private val BatchSize = 32
  private val NChunks = 8

  /** The stubbed decoder: deterministic per-chunk byte means. A real
    * deployment swaps decodeOne's body for an image/audio codec; the
    * batching contract stays identical. */
  private def decodeOne(docId: Long, media: Array[Byte], batchSize: Int): MediaFeatures = {
    val n = media.length
    val feats = Array.tabulate(NChunks) { c =>
      val lo = (n.toLong * c / NChunks).toInt
      val hi = (n.toLong * (c + 1) / NChunks).toInt
      if (hi <= lo) 0.0f
      else {
        var s = 0L; var i = lo
        while (i < hi) { s += media(i) & 0xff; i += 1 }
        (s.toDouble / (hi - lo)).toFloat
      }
    }
    MediaFeatures(docId, n, batchSize, feats)
  }

  /** J2 `multimodal_feature_stub` (rows-only) — batched decode over
    * the binary column: mapPartitions + grouped(BatchSize), so each
    * "codec call" sees a bounded batch and partitions stream without
    * materializing. */
  def featureStub(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media: Dataset[(Long, Array[Byte])] = mediaTable(spark, dir)
      .select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.map { case (id, bytes) => decodeOne(id, bytes, batch.size) }
      }
    }.toDF()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_feature_stub" -> (featureStub _))

  /** rows-only: binary feature extraction has no SQL oracle; covered
    * by MultimodalSpec (schema, batch shape, determinism). */
  val oracles: Map[String, String] = Map.empty
}
