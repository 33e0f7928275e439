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
  def featureStubSql: String = {
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
  def frameSampleSql: String =
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

  def resizeStubSql: String =
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

  // ---- J5: REAL codec behind the same batching seam ----------------

  private val ImgW = 8
  private val ImgH = 8

  /** Deterministic synthetic image: pixel channels are pure functions
    * of (doc_id, x, y), so the decode output is reproducible in plain
    * SQL without any codec — which is what lets a real PNG round-trip
    * be driver-oracle-checked. */
  private def synthPng(docId: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      ImgW, ImgH, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < ImgH) {
      var x = 0
      while (x < ImgW) {
        val r = ((docId * 7 + x * 3 + y * 5) % 256).toInt
        val g = ((docId * 11 + x * 13 + y * 17) % 256).toInt
        val b = ((docId * 19 + x * 23 + y * 29) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** J5 media table: real PNG bytes in the binary column (media is
    * synthesized per doc_id on the executors — nothing driver-side). */
  def pngTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false) // no tmp-file cache on executors
        it.map(id => (id, synthPng(id)))
      }.toDF("doc_id", "media")
  }

  case class DecodedImage(doc_id: Long, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** The real decoder: javax.imageio PNG decode (lossless, so pixels
    * recover exactly), per-channel integer SUMS — integers, not float
    * means, so the oracle compare is bit-exact. Non-decodable media
    * in a production feed would route to the C2-style reject channel;
    * here the synth PNGs always decode, so a null decode is a hard
    * error rather than a silent drop. */
  private def decodeImage(docId: Long, png: Array[Byte]): DecodedImage = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    require(img != null, s"undecodable image for doc $docId")
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
        x += 1
      }
      y += 1
    }
    DecodedImage(docId, img.getWidth, img.getHeight, sr, sg, sb)
  }

  /** J5 `multimodal_decode_real` — a REAL image decode through the
    * identical mapPartitions + grouped(BatchSize) seam the stubs use:
    * encode a deterministic 8x8 PNG per doc, decode it back with
    * javax.imageio, emit per-channel pixel sums. Proves the batching
    * contract carries an actual codec (J2-J4's remaining gap), and
    * because the pixels are a pure function of (doc_id,x,y) the
    * result is fully driver-oracle-checked — rare for codec code. */
  def decodeReal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media: Dataset[(Long, Array[Byte])] = pngTable(spark, dir)
      .select(col("doc_id"), col("media")).as[(Long, Array[Byte])]
    media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.grouped(BatchSize).flatMap { batch =>
        batch.map { case (id, bytes) => decodeImage(id, bytes) }
      }
    }.toDF()
  }

  def decodeRealSql: String =
    s"""WITH px AS (
       |  SELECT doc_id, unnest(range(0, $ImgW)) AS x FROM documents
       |), pxy AS (
       |  SELECT doc_id, x, unnest(range(0, $ImgH)) AS y FROM px
       |)
       |SELECT doc_id,
       |  CAST($ImgW AS INTEGER) AS width,
       |  CAST($ImgH AS INTEGER) AS height,
       |  CAST(SUM((doc_id * 7 + x * 3 + y * 5) % 256) AS BIGINT) AS sum_r,
       |  CAST(SUM((doc_id * 11 + x * 13 + y * 17) % 256) AS BIGINT) AS sum_g,
       |  CAST(SUM((doc_id * 19 + x * 23 + y * 29) % 256) AS BIGINT) AS sum_b
       |FROM pxy GROUP BY doc_id""".stripMargin

  private val ImgGroups = 100

  /** J6 `multimodal_image_dedup` — dedup of a multimodal corpus by
    * DECODED content, not raw bytes (the point of perceptual dedup:
    * re-encoded copies differ byte-wise but decode identically).
    * Media synth deliberately reuses images across docs (image id =
    * doc_id % [[ImgGroups]], ~5 copies each), each PNG is REALLY
    * decoded through the J5 codec seam, and the dedup key is a
    * fingerprint of the decoded channel statistics — the stand-in for
    * a perceptual hash (pHash/dHash would drop into the same
    * fingerprint column; channel sums keep it exactly
    * oracle-checkable). Downstream is G1's shape: one shuffle on the
    * fingerprint, keeper = min doc_id. */
  def imageDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media: Dataset[(Long, Array[Byte])] =
      Tables.documents(spark, dir).select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          javax.imageio.ImageIO.setUseCache(false)
          it.map(id => (id, synthPng(id % ImgGroups)))
        }.toDF("doc_id", "media").as[(Long, Array[Byte])]
    val decoded = media.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.grouped(BatchSize).flatMap { batch =>
        batch.map { case (id, bytes) => decodeImage(id, bytes) }
      }
    }.toDF()
    decoded
      .groupBy(md5(concat_ws(":", col("width"), col("height"), col("sum_r"),
        col("sum_g"), col("sum_b")).cast("binary")).as("img_fingerprint"))
      .agg(min(col("doc_id")).as("keeper_doc_id"), count(lit(1)).as("n_copies"))
  }

  def imageDedupSql: String =
    s"""WITH px AS (
       |  SELECT doc_id, doc_id % $ImgGroups AS gid,
       |    unnest(range(0, $ImgW)) AS x
       |  FROM documents
       |), pxy AS (
       |  SELECT doc_id, gid, x, unnest(range(0, $ImgH)) AS y FROM px
       |), dec AS (
       |  SELECT doc_id,
       |    CAST(SUM((gid * 7 + x * 3 + y * 5) % 256) AS BIGINT) AS sum_r,
       |    CAST(SUM((gid * 11 + x * 13 + y * 17) % 256) AS BIGINT) AS sum_g,
       |    CAST(SUM((gid * 19 + x * 23 + y * 29) % 256) AS BIGINT) AS sum_b
       |  FROM pxy GROUP BY 1
       |)
       |SELECT md5($ImgW || ':' || $ImgH || ':' || sum_r || ':' || sum_g
       |    || ':' || sum_b) AS img_fingerprint,
       |  MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies
       |FROM dec GROUP BY 1""".stripMargin

  case class AhashRow(doc_id: Long, ahash_hi: Long, ahash_lo: Long)

  /** J7 `multimodal_ahash` — perceptual average-hash over REALLY
    * decoded pixels: the 64-bit aHash (bit i=y·8+x set iff pixel
    * luminance exceeds the image mean — the classic
    * downsample-and-threshold perceptual fingerprint; the 8×8 synth
    * images ARE the aHash grid, so no resample step). Luminance is
    * the integer channel sum and the threshold is the exact integer
    * cross-multiply 64·lum > Σlum (F14 discipline — no float mean,
    * boundaries can't drift), the hash splits into two 32-bit BIGINT
    * halves so neither engine touches the sign bit. The decode runs
    * through the same mapPartitions + grouped(BatchSize) codec seam
    * as J5; the oracle replays the procedural pixel formula in SQL.
    * Downstream, near-dup grouping on the hash is G18's
    * bit_count(xor) hamming mechanic; here identical images (synth
    * reuses ~5 copies per image group) collapse to identical hashes
    * — keeper = min doc id, G1's shape. */
  def ahash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hashed: Dataset[AhashRow] =
      Tables.documents(spark, dir).select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          javax.imageio.ImageIO.setUseCache(false)
          it.grouped(BatchSize).flatMap { batch =>
            batch.map { id =>
              val img = javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(synthPng(id % ImgGroups)))
              val lum = new Array[Long](ImgW * ImgH)
              var total = 0L
              var y = 0
              while (y < ImgH) {
                var x = 0
                while (x < ImgW) {
                  val rgb = img.getRGB(x, y)
                  val l = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
                  lum(y * ImgW + x) = l
                  total += l
                  x += 1
                }
                y += 1
              }
              var hi = 0L
              var lo = 0L
              var i = 0
              while (i < 64) {
                if (64L * lum(i) > total) {
                  if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
                }
                i += 1
              }
              AhashRow(id, hi, lo)
            }
          }
        }
    hashed.toDF()
      .groupBy(col("ahash_hi"), col("ahash_lo"))
      .agg(min(col("doc_id")).as("keeper_doc_id"), count(lit(1)).as("n_docs"))
      .orderBy(col("ahash_hi"), col("ahash_lo"))
  }

  def ahashSql: String =
    s"""WITH px AS (
       |  SELECT doc_id, doc_id % $ImgGroups AS gid,
       |    unnest(range(0, $ImgW)) AS x
       |  FROM documents
       |), pxy AS (
       |  SELECT doc_id, gid, x, unnest(range(0, $ImgH)) AS y FROM px
       |), lum AS (
       |  SELECT doc_id, CAST(y * $ImgW + x AS BIGINT) AS idx,
       |    CAST((gid * 7 + x * 3 + y * 5) % 256
       |       + (gid * 11 + x * 13 + y * 17) % 256
       |       + (gid * 19 + x * 23 + y * 29) % 256 AS BIGINT) AS l
       |  FROM pxy
       |), tot AS (
       |  SELECT doc_id, idx, l, SUM(l) OVER (PARTITION BY doc_id) AS t
       |  FROM lum
       |), bits AS (
       |  SELECT doc_id,
       |    CAST(SUM(CASE WHEN 64 * l > t AND idx >= 32
       |                  THEN CAST(1 AS BIGINT) << CAST(idx - 32 AS INTEGER)
       |                  ELSE 0 END) AS BIGINT) AS ahash_hi,
       |    CAST(SUM(CASE WHEN 64 * l > t AND idx < 32
       |                  THEN CAST(1 AS BIGINT) << CAST(idx AS INTEGER)
       |                  ELSE 0 END) AS BIGINT) AS ahash_lo
       |  FROM tot GROUP BY 1
       |)
       |SELECT ahash_hi, ahash_lo, MIN(doc_id) AS keeper_doc_id,
       |  COUNT(*) AS n_docs
       |FROM bits GROUP BY 1, 2
       |ORDER BY ahash_hi, ahash_lo""".stripMargin

  case class DhashRow(doc_id: Long, dhash: Long)

  /** J8 `multimodal_dhash` — perceptual DIFFERENCE hash over really
    * decoded pixels: bit (y·7+x) set iff luminance INCREASES left to
    * right, lum(x+1,y) > lum(x,y) — the gradient-structure
    * fingerprint that survives global brightness shifts aHash (J7)
    * is sensitive to (the standard dHash tradeoff; production dedup
    * runs both and ANDs the matches). 8 rows × 7 horizontal
    * comparisons = 56 bits, packed into ONE sign-safe BIGINT.
    * Pure integer comparisons — no mean, no threshold drift. Same
    * mapPartitions + grouped(BatchSize) codec seam as J5/J7; the
    * oracle replays the procedural pixel formula with an idx+1
    * self-alignment inside each row. Downstream is G1's shape on the
    * hash (synth reuses ~5 copies per image group). */
  def dhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hashed: Dataset[DhashRow] =
      Tables.documents(spark, dir).select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          javax.imageio.ImageIO.setUseCache(false)
          it.grouped(BatchSize).flatMap { batch =>
            batch.map { id =>
              val img = javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(synthPng(id % ImgGroups)))
              def lum(x: Int, y: Int): Long = {
                val rgb = img.getRGB(x, y)
                ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              }
              var h = 0L
              var y = 0
              while (y < ImgH) {
                var x = 0
                while (x < ImgW - 1) {
                  if (lum(x + 1, y) > lum(x, y)) h |= 1L << (y * 7 + x)
                  x += 1
                }
                y += 1
              }
              DhashRow(id, h)
            }
          }
        }
    hashed.toDF()
      .groupBy(col("dhash"))
      .agg(min(col("doc_id")).as("keeper_doc_id"), count(lit(1)).as("n_docs"))
      .orderBy(col("dhash"))
  }

  def dhashSql: String =
    s"""WITH px AS (
       |  SELECT doc_id, doc_id % $ImgGroups AS gid,
       |    unnest(range(0, ${ImgW - 1})) AS x
       |  FROM documents
       |), pxy AS (
       |  SELECT doc_id, gid, x, unnest(range(0, $ImgH)) AS y FROM px
       |), cmp AS (
       |  SELECT doc_id, x, y,
       |    CAST((gid * 7 + (x+1) * 3 + y * 5) % 256
       |       + (gid * 11 + (x+1) * 13 + y * 17) % 256
       |       + (gid * 19 + (x+1) * 23 + y * 29) % 256 AS BIGINT)
       |    > CAST((gid * 7 + x * 3 + y * 5) % 256
       |       + (gid * 11 + x * 13 + y * 17) % 256
       |       + (gid * 19 + x * 23 + y * 29) % 256 AS BIGINT) AS up
       |  FROM pxy
       |), bits AS (
       |  SELECT doc_id,
       |    CAST(SUM(CASE WHEN up
       |                  THEN CAST(1 AS BIGINT) << CAST(y * 7 + x AS INTEGER)
       |                  ELSE 0 END) AS BIGINT) AS dhash
       |  FROM cmp GROUP BY 1
       |)
       |SELECT dhash, MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_docs
       |FROM bits GROUP BY 1 ORDER BY dhash""".stripMargin

  case class PhashRow(doc_id: Long, phash: Long)

  /** The fixed-point DCT-II basis, scaled by [[PhScale]]:
    * Ct(u)(x) = round(cos(π·(2x+1)·u / 16) · 10⁶). Computed once on
    * the driver and embedded as literals in BOTH engines (the oracle
    * SQL is generated from this same array), so the transform is
    * bit-identical by construction — no transcendental ever runs
    * inside either engine. */
  private val PhScale = 1000000L
  private val PhCos: Array[Array[Long]] = Array.tabulate(ImgH, ImgW)(
    (u, x) => math.round(
      math.cos(math.Pi * (2 * x + 1) * u / (2.0 * ImgW)) * PhScale))

  /** J9 `multimodal_phash` — perceptual DCT hash, completing the
    * aHash/dHash/pHash trio production image dedup actually ANDs
    * (pHash keys on the low-frequency SPECTRUM, so it survives the
    * rescaling/blur that move J7's mean bits and J8's local
    * gradients). Standard pHash resamples to 32×32 then keeps the
    * top-left 8×8 DCT block; the 8×8 synth images here are already
    * at grid size (J7's convention), so the transform is a direct
    * 8×8 DCT-II and the hash keeps the top-left 4×4 low-frequency
    * block. Integer-exact route (the r10 verdict's prescription):
    * luminance is the integer channel sum (0..765), the DCT is an
    * exact integer bilinear form over the [[PhCos]] fixed-point
    * cosine table (|coef| ≤ 765·10¹²·64 ≈ 4.9·10¹⁶ — comfortably in
    * a BIGINT), and the bit threshold is the EXACT MEDIAN of the 15
    * AC coefficients (DC excluded as in every production pHash — it
    * only encodes brightness): with an odd count the median is an
    * actual data point (the F21 exact-median trick), so bit
    * boundaries cannot drift between engines. Bit (u·4+v) set iff
    * coef > median; 15 bits, one sign-safe BIGINT. Same
    * mapPartitions + grouped(BatchSize) codec seam as J5/J7/J8;
    * downstream is G1's shape (synth reuses ~5 copies per image
    * group) and G18's bit_count(xor) hamming mechanic applies. */
  def phash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ct = PhCos // avoid capturing `this` in the task closure
    val hashed: Dataset[PhashRow] =
      Tables.documents(spark, dir).select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          javax.imageio.ImageIO.setUseCache(false)
          it.grouped(BatchSize).flatMap { batch =>
            batch.map { id =>
              val img = javax.imageio.ImageIO.read(
                new java.io.ByteArrayInputStream(synthPng(id % ImgGroups)))
              val lum = Array.tabulate(ImgH, ImgW) { (y, x) =>
                val rgb = img.getRGB(x, y)
                (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)).toLong
              }
              // 15 AC coefficients of the top-left 4x4 block
              val coefs = for {
                u <- 0 until 4; v <- 0 until 4 if u != 0 || v != 0
              } yield {
                var c = 0L
                var y = 0
                while (y < ImgH) {
                  var x = 0
                  while (x < ImgW) {
                    c += lum(y)(x) * ct(u)(x) * ct(v)(y)
                    x += 1
                  }
                  y += 1
                }
                (u * 4 + v, c)
              }
              val median = coefs.map(_._2).sorted.apply(coefs.size / 2)
              var h = 0L
              coefs.foreach { case (bit, c) =>
                if (c > median) h |= 1L << bit
              }
              PhashRow(id, h)
            }
          }
        }
    hashed.toDF()
      .groupBy(col("phash"))
      .agg(min(col("doc_id")).as("keeper_doc_id"), count(lit(1)).as("n_docs"))
      .orderBy(col("phash"))
  }

  def phashSql: String = {
    // the SAME fixed-point cosine table, as a VALUES relation — the
    // oracle's transform is literal-identical to the engine's
    val ctRows = (for (u <- 0 until 4; x <- 0 until ImgW)
      yield s"($u, $x, ${PhCos(u)(x)})").mkString(", ")
    s"""WITH px AS (
       |  SELECT doc_id, doc_id % $ImgGroups AS gid,
       |    unnest(range(0, $ImgW)) AS x
       |  FROM documents
       |), pxy AS (
       |  SELECT doc_id, gid, x, unnest(range(0, $ImgH)) AS y FROM px
       |), lum AS (
       |  SELECT doc_id, x, y,
       |    CAST((gid * 7 + x * 3 + y * 5) % 256
       |       + (gid * 11 + x * 13 + y * 17) % 256
       |       + (gid * 19 + x * 23 + y * 29) % 256 AS BIGINT) AS l
       |  FROM pxy
       |), ct(u, x, c) AS (VALUES $ctRows),
       |coef AS (
       |  SELECT l.doc_id, tu.u, tv.u AS v,
       |    CAST(SUM(l.l * tu.c * tv.c) AS BIGINT) AS cval
       |  FROM lum l
       |  JOIN ct tu ON tu.x = l.x
       |  JOIN ct tv ON tv.x = l.y
       |  WHERE NOT (tu.u = 0 AND tv.u = 0)
       |  GROUP BY 1, 2, 3
       |), med AS (
       |  SELECT doc_id, quantile_disc(cval, 0.5) AS m FROM coef GROUP BY 1
       |), bits AS (
       |  SELECT c.doc_id,
       |    CAST(SUM(CASE WHEN c.cval > m.m
       |                  THEN CAST(1 AS BIGINT) << CAST(c.u * 4 + c.v AS INTEGER)
       |                  ELSE 0 END) AS BIGINT) AS phash
       |  FROM coef c JOIN med m ON c.doc_id = m.doc_id GROUP BY 1
       |)
       |SELECT phash, MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_docs
       |FROM bits GROUP BY 1 ORDER BY phash""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_phash" -> (phash _),
    "multimodal_dhash" -> (dhash _),
    "multimodal_ahash" -> (ahash _),
    "multimodal_feature_stub" -> (featureStub _),
    "multimodal_frame_sample" -> (frameSample _),
    "multimodal_resize_stub" -> (resizeStub _),
    "multimodal_decode_real" -> (decodeReal _),
    "multimodal_image_dedup" -> (imageDedup _))

  val oracles: Map[String, String] = Map(
    "multimodal_phash" -> phashSql,
    "multimodal_dhash" -> dhashSql,
    "multimodal_ahash" -> ahashSql,
    "multimodal_feature_stub" -> featureStubSql,
    "multimodal_frame_sample" -> frameSampleSql,
    "multimodal_resize_stub" -> resizeStubSql,
    "multimodal_decode_real" -> decodeRealSql,
    "multimodal_image_dedup" -> imageDedupSql)
}
