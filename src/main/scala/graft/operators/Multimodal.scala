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

  /** Batched decode over the binary column: mapPartitions +
    * grouped(BatchSize), so each "codec call" sees a bounded batch and
    * partitions stream without materializing. Carries the raw
    * features array + observed batch size for the spec's batching
    * assertions; the driver-checked query is the flattened
    * [[featureStub]]. */
  def featureStubRaw(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media: Dataset[(Long, Array[Byte])] = mediaTable(spark, dir)
      .select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.map { case (id, bytes) => decodeOne(id, bytes, batch.size) }
      }
    }.toDF()
  }

  /** J2 `multimodal_feature_stub` — the decode output with the 8
    * chunk features as scalar columns f0..f7 (an Array column is not
    * canonicalizable by the driver harness; same information, and the
    * chunked byte means become DuckDB-expressible → full oracle). */
  def featureStub(spark: SparkSession, dir: String): DataFrame = {
    val feats = (0 until NChunks).map(i => col("features")(i).as(s"f$i"))
    featureStubRaw(spark, dir)
      .select((col("doc_id") +: col("n_bytes") +: feats): _*)
  }

  /** Chunk c covers byte indices [n*c/8, n*(c+1)/8) — 1-based slice
    * [lo+1, hi] in DuckDB. The documents table is ASCII-only (checked
    * at every SF), so ascii(char) == byte value; the mean is an exact
    * integer sum divided as DOUBLE then cast FLOAT — bit-identical to
    * the Scala `(s.toDouble / (hi - lo)).toFloat`. */
  val featureStubSql: String = {
    val chunks = (0 until NChunks).map { c =>
      val lo = s"(n_bytes * $c) // $NChunks"
      val hi = s"(n_bytes * ${c + 1}) // $NChunks"
      s"""  CAST(CASE WHEN $hi <= $lo THEN 0.0
         |    ELSE CAST(list_sum(bytes[$lo + 1 : $hi]) AS DOUBLE) / ($hi - $lo)
         |    END AS FLOAT) AS f$c""".stripMargin
    }.mkString(",\n")
    s"""WITH b AS (
       |  SELECT doc_id, length(text) AS n_bytes,
       |    list_transform(str_split(text, ''), c -> ascii(c)) AS bytes
       |  FROM documents
       |)
       |SELECT doc_id, n_bytes,
       |$chunks
       |FROM b""".stripMargin
  }

  case class FrameFeature(doc_id: Long, frame_idx: Int, n_frame_bytes: Int,
      frame_mean: Float)

  private val FrameBytes = 16
  private val FrameStride = 4

  /** The stubbed frame sampler: fixed-size frames (a video/audio
    * stand-in), every FrameStride-th full frame kept, per-frame byte
    * mean as the "feature". A real deployment swaps the body for a
    * codec's keyframe extraction; the one-to-many batched contract is
    * the production shape. */
  private def sampleFrames(docId: Long, media: Array[Byte]): Seq[FrameFeature] = {
    val nFrames = media.length / FrameBytes // full frames only
    (0 until nFrames by FrameStride).map { f =>
      val lo = f * FrameBytes
      var s = 0L
      var i = lo
      while (i < lo + FrameBytes) { s += media(i) & 0xff; i += 1 }
      FrameFeature(docId, f, FrameBytes, (s.toDouble / FrameBytes).toFloat)
    }
  }

  /** J3 `multimodal_frame_sample` — deterministic frame sampling over
    * the binary column: same mapPartitions + grouped(BatchSize)
    * batching as J2, but one-to-many (each media blob yields a row
    * per sampled frame). */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media: Dataset[(Long, Array[Byte])] = mediaTable(spark, dir)
      .select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.flatMap { case (id, bytes) => sampleFrames(id, bytes) }
      }
    }.toDF()
  }

  /** Frame f covers bytes [f*16, f*16+16); docs shorter than one
    * frame produce no rows in either engine. */
  val frameSampleSql: String =
    s"""WITH b AS (
       |  SELECT doc_id, length(text) AS n,
       |    list_transform(str_split(text, ''), c -> ascii(c)) AS bytes
       |  FROM documents
       |), f AS (
       |  SELECT doc_id, bytes,
       |    unnest(range(0, n // $FrameBytes)) AS frame_idx
       |  FROM b
       |)
       |SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
       |  $FrameBytes AS n_frame_bytes,
       |  CAST(CAST(list_sum(
       |      bytes[frame_idx * $FrameBytes + 1 : frame_idx * $FrameBytes + $FrameBytes])
       |    AS DOUBLE) / $FrameBytes AS FLOAT) AS frame_mean
       |FROM f WHERE frame_idx % $FrameStride = 0""".stripMargin

  case class ResizedPixel(doc_id: Long, out_idx: Int, pix: Int)

  private val ResizeW = 32

  /** The stubbed resizer: nearest-neighbor resample of the 1xN "image"
    * to a fixed 1x32 — out pixel i reads source byte floor(i*n/32).
    * A real deployment swaps the body for an image library's resize;
    * the fixed-output-shape batched contract is what a training
    * pipeline needs (constant tensor shapes downstream). */
  private def resizeOne(docId: Long, media: Array[Byte]): Seq[ResizedPixel] =
    if (media.isEmpty) Seq.empty
    else (0 until ResizeW).map { i =>
      ResizedPixel(docId, i,
        media(((i.toLong * media.length) / ResizeW).toInt) & 0xff)
    }

  /** J4 `multimodal_resize_stub` — deterministic nearest-neighbor
    * resize over the binary column, long format (one row per output
    * pixel), through the same mapPartitions batching seam. */
  def resizeStub(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media: Dataset[(Long, Array[Byte])] = mediaTable(spark, dir)
      .select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.flatMap { case (id, bytes) => resizeOne(id, bytes) }
      }
    }.toDF()
  }

  val resizeStubSql: String =
    s"""WITH b AS (
       |  SELECT doc_id, length(text) AS n,
       |    list_transform(str_split(text, ''), c -> ascii(c)) AS bytes
       |  FROM documents WHERE length(text) > 0
       |), px AS (
       |  SELECT doc_id, n, bytes, unnest(range(0, $ResizeW)) AS i
       |  FROM b
       |)
       |SELECT doc_id, CAST(i AS INTEGER) AS out_idx,
       |  CAST(bytes[(i * n) // $ResizeW + 1] AS INTEGER) AS pix
       |FROM px""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_feature_stub" -> (featureStub _),
    "multimodal_frame_sample" -> (frameSample _),
    "multimodal_resize_stub" -> (resizeStub _))

  val oracles: Map[String, String] = Map(
    "multimodal_feature_stub" -> featureStubSql,
    "multimodal_frame_sample" -> frameSampleSql,
    "multimodal_resize_stub" -> resizeStubSql)
}
