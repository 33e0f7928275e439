package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorOps._
import graft.functions.VectorExpressions.vdotNative

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (SURVEY §2.H). Brute force (H1) is the correctness baseline —
  * integer-exact quantized dot products so ranks are deterministic
  * across engines. The scale paths are LSH (H3) and IVF (H4): at
  * 100 TB the candidate set per query is O(bucket) not O(n); both are
  * equi-joins on bucket/cell keys so they shuffle-partition cleanly
  * across a cluster. The synthetic embeddings are near-random
  * (max pairwise cosine ~0.5), so recall bounds in specs are modest —
  * the mechanisms (bucketing, multiprobe, re-rank) are what's tested.
  */
object Similarity {

  private val K = 10
  private val NQueries = 8

  private def quantized(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"),
        vquantize(col("embedding"), 10000.0).as("qvec"))

  /** Embeddings pre-normalized to unit length — one pass per vector,
    * so every pairwise cosine downstream is a single native dot
    * product (FloatVectorDot) instead of dot + two norms. This cut
    * the all-pairs query from 74 s to single digits at sf0.1. */
  private def normalized(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        transform(col("embedding"),
          x => (x.cast("double") / sqrt(vdot(col("embedding"), col("embedding"))))
            .cast("float")).as("nvec"))

  /** H1 `sim_topk_bruteforce` — top-k by quantized dot product for the
    * first NQueries vectors. Queries are broadcast (tiny side), the
    * corpus side streams: one pass over n rows per batch of queries,
    * then a per-query top-k window. */
  def topkBruteforce(spark: SparkSession, dir: String): DataFrame = {
    val emb = quantized(spark, dir)
    val q = emb.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), col("qvec").as("qq"))
    val w = Window.partitionBy(col("qid")).orderBy(col("dot").desc, col("vec_id"))
    emb.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("dot", vdotQuantized(col("qq"), col("qvec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("qid"), col("rank"), col("vec_id"), col("dot"))
  }

  val topkBruteforceSql: String =
    s"""WITH q AS (
       |  SELECT vec_id AS qid,
       |    list_transform(embedding,
       |      x -> CAST(ROUND(CAST(x AS DOUBLE) * 10000.0) AS BIGINT)) AS qq
       |  FROM embeddings WHERE vec_id < $NQueries
       |), c AS (
       |  SELECT vec_id,
       |    list_transform(embedding,
       |      x -> CAST(ROUND(CAST(x AS DOUBLE) * 10000.0) AS BIGINT)) AS qvec
       |  FROM embeddings
       |), d AS (
       |  SELECT qid, vec_id,
       |    CAST(list_sum(list_transform(list_zip(qq, qvec), s -> s[1] * s[2]))
       |      AS BIGINT) AS dot
       |  FROM q JOIN c ON vec_id <> qid
       |)
       |SELECT qid, rank, vec_id, dot FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
       |                               ORDER BY dot DESC, vec_id) AS rank
       |  FROM d
       |) WHERE rank <= $K""".stripMargin

  /** H2 `sim_cosine_pairs` (rows-only) — all pairs above a cosine
    * threshold. The O(n^2) float version: correctness baseline for the
    * spec's recall checks; production path at scale is H3/H4. */
  def cosinePairs(spark: SparkSession, dir: String): DataFrame = {
    val emb = normalized(spark, dir)
    val a = emb.select(col("vec_id").as("vec_a"), col("nvec").as("ea"))
    val b = emb.select(col("vec_id").as("vec_b"), col("nvec").as("eb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cosine", vdotNative(col("ea"), col("eb")))
      .filter(col("cosine") >= 0.35)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
  }

  /** Deterministic pseudo-random hyperplanes derived from md5 — no
    * RNG, reproducible across runs/engines (cited pattern: seeded
    * random-hyperplane LSH, Charikar'02 SimHash for cosine). */
  private[operators] def planes(nPlanes: Int, dim: Int = 64): Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until nPlanes).map { p =>
      (0 until dim).map { j =>
        val h = md.digest(s"$p:$j".getBytes("UTF-8"))
          .take(8).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL)) & Long.MaxValue
        ((h % 2001L) - 1000L).toDouble / 1000.0
      }
    }
  }

  private val NPlanes = 4

  /** Sign-bit bucket of a vector against the hyperplanes. */
  private def bucketCol(e: Column): Column =
    planes(NPlanes).zipWithIndex.map { case (pl, i) =>
      val planeArr = array(pl.map(lit): _*)
      when(vdot(e, planeArr) > 0.0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** H3 `sim_lsh_ann` (rows-only) — random-hyperplane LSH ANN with
    * hamming<=1 multiprobe: each query expands to NPlanes+1 probe
    * buckets (equi-join keys — this is what distributes at scale: the
    * corpus is hash-partitioned by bucket, each probe hits one
    * partition), candidates re-ranked by exact cosine. */
  def lshAnn(spark: SparkSession, dir: String): DataFrame = {
    val emb = normalized(spark, dir)
      .withColumn("bucket", bucketCol(col("nvec")))
    val probes = emb.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), col("nvec").as("qe"), col("bucket").as("qb"),
        explode(array((lit(0) +: (0 until NPlanes).map(i => lit(1 << i))): _*))
          .as("flip"))
      .select(col("qid"), col("qe"), col("qb").bitwiseXOR(col("flip")).as("bucket"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("vec_id"))
    emb.join(broadcast(probes), Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cosine", vdotNative(col("qe"), col("nvec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("qid"), col("rank"), col("vec_id"), col("cosine"), col("bucket"))
  }

  private val NProbeCells = 2
  private val MaxCentroids = 256

  /** H4 `sim_ivf_probe` (rows-only) — IVF-style partitioned search:
    * deterministic coarse centroids, every vector assigned to its
    * nearest centroid (the inverted file), queries probe the
    * NProbeCells nearest cells and re-rank by exact cosine. At scale
    * the corpus is partitioned by cell id; a query touches only its
    * probed partitions.
    *
    * Centroid count is ~sqrt(n) CAPPED at MaxCentroids and hash-picked
    * (smallest md5(vec_id) — a deterministic sample, TakeOrdered not a
    * sort). The cap bounds the broadcast (≤256 × 64 floats) and the
    * assignment work (O(n·k)) no matter the corpus size — an
    * every-Nth-vector scheme would grow both linearly with n. A real
    * deployment would k-means a sample for better cell balance; the
    * partitioning/probing mechanics are identical. */
  def ivfProbe(spark: SparkSession, dir: String): DataFrame = {
    val emb = normalized(spark, dir)
    val k = math.min(MaxCentroids,
      math.max(8, math.ceil(math.sqrt(emb.count().toDouble)).toInt))
    val cents = emb.orderBy(md5(col("vec_id").cast("string"))).limit(k)
      .select(col("vec_id").as("cent_id"), col("nvec").as("ce"))
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("cent_cos").desc, col("cent_id"))
    val assigned = emb.crossJoin(broadcast(cents))
      .withColumn("cent_cos", vdotNative(col("nvec"), col("ce")))
      .withColumn("arn", row_number().over(wAssign))
      .filter(col("arn") === 1)
      .select(col("vec_id"), col("nvec"), col("cent_id").as("cell"))
    val wProbe = Window.partitionBy(col("qid"))
      .orderBy(col("qcent_cos").desc, col("cent_id"))
    val probes = emb.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("qid"), col("nvec").as("qe"))
      .crossJoin(broadcast(cents))
      .withColumn("qcent_cos", vdotNative(col("qe"), col("ce")))
      .withColumn("prn", row_number().over(wProbe))
      .filter(col("prn") <= NProbeCells)
      .select(col("qid"), col("qe"), col("cent_id").as("cell"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("vec_id"))
    assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cosine", vdotNative(col("qe"), col("nvec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= K)
      .select(col("qid"), col("rank"), col("vec_id"), col("cosine"), col("cell"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_topk_bruteforce" -> (topkBruteforce _),
    "sim_cosine_pairs" -> (cosinePairs _),
    "sim_lsh_ann" -> (lshAnn _),
    "sim_ivf_probe" -> (ivfProbe _))

  /** H2-H4 are rows-only: float cosine ranking is not hash-stable
    * across engines (summation order); covered by SimilaritySpec
    * recall/containment checks against the H1 baseline. */
  val oracles: Map[String, String] = Map(
    "sim_topk_bruteforce" -> topkBruteforceSql)
}
