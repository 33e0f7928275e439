package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Specs for the multimodal plumbing (SURVEY §2.J). */
class MultimodalSpec extends SparkSpecBase {

  test("J1 media table: binary column + typed metadata struct, partitionable") {
    val df = operators.Multimodal.mediaTable(spark, sf)
    assert(df.schema("media").dataType == BinaryType)
    val meta = df.schema("meta").dataType.asInstanceOf[StructType]
    assert(meta.fieldNames.sameElements(Array("width", "height", "format", "origin")))
    // partition-friendly: write partitioned by origin, read back pruned
    val out = java.nio.file.Files.createTempDirectory("media").toString
    df.withColumn("origin", col("meta.origin"))
      .write.mode("overwrite").partitionBy("origin").parquet(out)
    val pruned = spark.read.parquet(out).filter(col("origin") === "src0")
    assert(pruned.count() == df.filter(col("meta.origin") === "src0").count())
  }

  test("J3 frame sample: stride-4 full frames only, means in byte range") {
    val df = run("multimodal_frame_sample").cache()
    assert(df.filter(pmod(col("frame_idx"), lit(4)) =!= 0).count() == 0)
    assert(df.filter(col("n_frame_bytes") =!= 16).count() == 0)
    assert(df.filter(col("frame_mean") < 0.0f || col("frame_mean") >= 256.0f)
      .count() == 0)
    // frame count per doc = ceil((len/16) / 4) for docs with >= 1 frame
    val expected = Tables.documents(spark, sf)
      .select(col("doc_id"), floor(col("n_chars") / 16).as("nf"))
      .filter(col("nf") > 0)
      .select(col("doc_id"), ceil(col("nf") / lit(4.0)).as("expect_n"))
    val got = df.groupBy("doc_id").count()
    assert(got.join(expected, Seq("doc_id"), "full")
      .filter(col("count").isNull || col("expect_n").isNull ||
        col("count") =!= col("expect_n")).count() == 0)
    df.unpersist()
  }

  test("J4 resize stub: fixed 32-pixel output per doc, bytes in range") {
    val df = run("multimodal_resize_stub").cache()
    val nDocs = Tables.documents(spark, sf).filter(length(col("text")) > 0).count()
    assert(df.count() == nDocs * 32)
    assert(df.groupBy("doc_id").count().filter(col("count") =!= 32).count() == 0)
    assert(df.filter(col("pix") < 0 || col("pix") > 255 ||
      col("out_idx") < 0 || col("out_idx") >= 32).count() == 0)
    df.unpersist()
  }

  test("J5 real decode: PNG round-trip recovers the known synth pixels") {
    val df = run("multimodal_decode_real").cache()
    assert(df.count() == Tables.documents(spark, sf).count())
    assert(df.filter(col("width") =!= 8 || col("height") =!= 8).count() == 0)
    // analytic ground truth: channel c of pixel (x,y) for doc d is
    // (d*kc + x*kx + y*ky) % 256 — recompute on the driver and compare
    def sums(d: Long, kc: Long, kx: Long, ky: Long): Long =
      (for { x <- 0 until 8; y <- 0 until 8 }
        yield (d * kc + x * kx + y * ky) % 256).sum
    df.collect().foreach { r =>
      val d = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("sum_r") == sums(d, 7, 3, 5), s"sum_r doc $d")
      assert(r.getAs[Long]("sum_g") == sums(d, 11, 13, 17), s"sum_g doc $d")
      assert(r.getAs[Long]("sum_b") == sums(d, 19, 23, 29), s"sum_b doc $d")
    }
    df.unpersist()
  }

  test("J2 feature stub: batch shape bounded, features deterministic") {
    val raw = operators.Multimodal.featureStubRaw(spark, sf).cache()
    assert(raw.filter(col("batch_size") > 32 || col("batch_size") < 1).count() == 0)
    assert(raw.filter(size(col("features")) =!= 8).count() == 0)
    raw.unpersist()

    val df = run("multimodal_feature_stub").cache()
    assert(df.columns.sameElements(
      Array("doc_id", "n_bytes") ++ (0 until 8).map(i => s"f$i")))
    assert(df.count() == Tables.documents(spark, sf).count())
    // deterministic: same features across two runs
    val a = df.collect().map(r => r.getLong(0) -> r.toSeq.drop(2)).toMap
    val b = run("multimodal_feature_stub").collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(2)).toMap
    assert(a == b)
    // byte means of ascii text land inside [0, 256)
    val feats = (0 until 8).map(i => col(s"f$i"))
    assert(df.filter(feats.map(f => f < 0.0f || f > 255.0f).reduce(_ || _))
      .count() == 0)
    df.unpersist()
  }

  test("J6 image dedup: copies collapse to their min-id keeper, corpus covered") {
    val rows = run("multimodal_image_dedup").collect()
    val nDocs = Tables.documents(spark, sf).count()
    // image id = doc_id % 100 -> at most 100 decoded-content groups
    assert(rows.length <= 100)
    assert(rows.map(_.getAs[Long]("n_copies")).sum == nDocs)
    // keeper of group g is g itself (the smallest id with id % 100 == g)
    assert(rows.forall(_.getAs[Long]("keeper_doc_id") < 100))
    assert(rows.map(_.getAs[String]("img_fingerprint")).distinct.length == rows.length)
  }

  test("J7 aHash: real-decode hashes match the procedural formula per doc") {
    val rows = run("multimodal_ahash").collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    // replay the aHash from the procedural pixel formula on the driver
    def hashOf(gid: Long): (Long, Long) = {
      val lum = for (y <- 0 until 8; x <- 0 until 8) yield
        ((gid * 7 + x * 3 + y * 5) % 256) +
          ((gid * 11 + x * 13 + y * 17) % 256) +
          ((gid * 19 + x * 23 + y * 29) % 256)
      val total = lum.sum
      var (hi, lo) = (0L, 0L)
      for (i <- 0 until 64 if 64L * lum(i) > total)
        if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
      (hi, lo)
    }
    val byKeeper = rows.map(r => (r.getAs[Long]("ahash_hi"),
      r.getAs[Long]("ahash_lo"))).toSet
    val want = (0L until math.min(100L, nDocs)).map(hashOf).toSet
    assert(byKeeper == want)
    // the hash has real contrast: not all-zero / all-one planes only
    assert(rows.exists(r => java.lang.Long.bitCount(r.getAs[Long]("ahash_lo"))
      + java.lang.Long.bitCount(r.getAs[Long]("ahash_hi")) > 8))
  }

  test("J8 dHash: real-decode gradient hashes match the procedural formula") {
    val rows = run("multimodal_dhash").collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    def lum(gid: Long, x: Int, y: Int): Long =
      ((gid * 7 + x * 3 + y * 5) % 256) +
        ((gid * 11 + x * 13 + y * 17) % 256) +
        ((gid * 19 + x * 23 + y * 29) % 256)
    def hashOf(gid: Long): Long = {
      var h = 0L
      for (y <- 0 until 8; x <- 0 until 7
           if lum(gid, x + 1, y) > lum(gid, x, y))
        h |= 1L << (y * 7 + x)
      h
    }
    val got = rows.map(_.getAs[Long]("dhash")).toSet
    val want = (0L until math.min(100L, nDocs)).map(hashOf).toSet
    assert(got == want)
    // gradient structure present, and sign-safe packing (56 bits)
    assert(rows.forall(_.getAs[Long]("dhash") >= 0L))
    assert(rows.exists(r =>
      java.lang.Long.bitCount(r.getAs[Long]("dhash")) > 8))
  }

  test("J10 neardup verdict: pairs, AND-verdict, and clusters equal a full driver replay") {
    val rows = run("multimodal_neardup_verdict").collect()
    val ids = Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0))
    // replay the perturbed pixel formula + all three hashes
    def lum(d: Long, x: Int, y: Int): Long = {
      val gid = d % 100; val copy = d / 100
      val g0 = (gid * 11 + x * 13 + y * 17) % 256
      val g = if (x == (copy % 8).toInt && y == ((copy / 8) % 8).toInt) {
        if (g0 < 128) g0 + 4 else g0 - 4
      } else g0
      (gid * 7 + x * 3 + y * 5) % 256 + g + (gid * 19 + x * 23 + y * 29) % 256
    }
    val ct = Array.tabulate(8, 8)((u, x) =>
      math.round(math.cos(math.Pi * (2 * x + 1) * u / 16.0) * 1000000.0))
    def tri(d: Long): (Long, Long, Long, Long) = {
      val ls = Array.tabulate(8, 8)((y, x) => lum(d, x, y))
      val total = ls.map(_.sum).sum
      var (hi, lo, dh) = (0L, 0L, 0L)
      for (i <- 0 until 64 if 64L * ls(i / 8)(i % 8) > total)
        if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
      for (y <- 0 until 8; x <- 0 until 7 if ls(y)(x + 1) > ls(y)(x))
        dh |= 1L << (y * 7 + x)
      val coefs = for (u <- 0 until 4; v <- 0 until 4 if u != 0 || v != 0)
        yield (u * 4 + v, (for (y <- 0 until 8; x <- 0 until 8)
          yield ls(y)(x) * ct(u)(x) * ct(v)(y)).sum)
      val med = coefs.map(_._2).sorted.apply(7)
      val ph = coefs.foldLeft(0L) { case (h, (b, c)) =>
        if (c > med) h | (1L << b) else h }
      (hi, lo, dh, ph)
    }
    // exact collapse to variants, then the 7-band candidate law
    val variants = ids.groupBy(tri).map { case (h, ds) =>
      (ds.min, ds.length.toLong, h) }.toSeq.sortBy(_._1)
    def bandsOf(h: (Long, Long, Long, Long)): Seq[(Int, Long)] = Seq(
      0 -> (h._2 & 0xffffL), 1 -> ((h._2 >> 16) & 0xffffL),
      2 -> (h._1 & 0xffffL), 3 -> ((h._1 >> 16) & 0xffffL),
      4 -> (h._3 & 0xfffffffL), 5 -> ((h._3 >> 28) & 0xfffffffL),
      6 -> h._4)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b).toLong
    val cand = (for {
      (ra, na, ha) <- variants; (rb, nb, hb) <- variants
      if ra < rb && bandsOf(ha).intersect(bandsOf(hb)).nonEmpty
    } yield {
      val (da, dd, dp) = (ham(ha._1, hb._1) + ham(ha._2, hb._2),
        ham(ha._3, hb._3), ham(ha._4, hb._4))
      ((ra, rb), (na, nb, da, dd, dp, da <= 2 && dd <= 1 && dp <= 3))
    }).toMap
    // served rows = the candidate set, distances and verdict exact
    val got = rows.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
      ((r.getAs[Long]("n_docs_a"), r.getAs[Long]("n_docs_b"),
        r.getAs[Long]("h_ahash"), r.getAs[Long]("h_dhash"),
        r.getAs[Long]("h_phash"), r.getAs[Boolean]("is_neardup")))).toMap
    assert(got == cand, "candidate pairs / distances / verdicts diverge")
    // pigeonhole completeness over ALL variant pairs: nothing under
    // the ANDed thresholds is missing from the candidate set
    for {
      (ra, _, ha) <- variants; (rb, _, hb) <- variants if ra < rb
      if ham(ha._1, hb._1) + ham(ha._2, hb._2) <= 2 &&
        ham(ha._3, hb._3) <= 1 && ham(ha._4, hb._4) <= 3
    } assert(cand.contains((ra, rb)), s"pigeonhole miss: ($ra,$rb)")
    // cluster labels = union-find over verdict edges, min-rep labels
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
    }
    cand.collect { case ((a, b), v) if v._6 =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    rows.foreach { r =>
      val rep = Option(r.getAs[java.lang.Long]("cluster_rep")).map(_.toLong)
      if (r.getAs[Boolean]("is_neardup"))
        assert(rep.contains(find(r.getAs[Long]("doc_a"))),
          s"cluster label diverges for (${r.getAs[Long]("doc_a")},${r.getAs[Long]("doc_b")})")
      else assert(rep.isEmpty, "rejected pair must carry no cluster")
    }
    assert(rows.exists(_.getAs[Boolean]("is_neardup")))
  }

  test("J9 pHash: real-decode DCT hashes match the fixed-point replay") {
    val rows = run("multimodal_phash").collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    def lum(gid: Long, x: Int, y: Int): Long =
      ((gid * 7 + x * 3 + y * 5) % 256) +
        ((gid * 11 + x * 13 + y * 17) % 256) +
        ((gid * 19 + x * 23 + y * 29) % 256)
    // the same fixed-point table construction as the operator
    val ct = Array.tabulate(8, 8)((u, x) =>
      math.round(math.cos(math.Pi * (2 * x + 1) * u / 16.0) * 1000000.0))
    def hashOf(gid: Long): Long = {
      val coefs = for (u <- 0 until 4; v <- 0 until 4 if u != 0 || v != 0)
        yield (u * 4 + v,
          (for (y <- 0 until 8; x <- 0 until 8)
            yield lum(gid, x, y) * ct(u)(x) * ct(v)(y)).sum)
      val median = coefs.map(_._2).sorted.apply(7)
      coefs.foldLeft(0L) { case (h, (bit, c)) =>
        if (c > median) h | (1L << bit) else h }
    }
    val got = rows.map(_.getAs[Long]("phash")).toSet
    val want = (0L until math.min(100L, nDocs)).map(hashOf).toSet
    assert(got == want)
    // 15 AC bits at positions 1..15 (DC position 0 never set), and
    // strict-majority thresholding: with an exact-median threshold at
    // most 7 of 15 coefficients can exceed it
    assert(rows.forall { r =>
      val h = r.getAs[Long]("phash")
      h >= 0L && (h & 1L) == 0L && h < (1L << 16) &&
        java.lang.Long.bitCount(h) <= 7
    })
    // the spectrum discriminates: many distinct hashes across groups
    assert(rows.length > 50)
  }
}
