package graft

import org.apache.spark.sql.functions._

/** Specs for the similarity-search slice (SURVEY §2.H). H1 is oracle-
  * checked; H2-H4 are verified here against the brute-force baseline. */
class SimilaritySpec extends SparkSpecBase {

  test("H26 codebook drift: null split stable, directional split escalates, laws re-derive") {
    def one(name: String) = {
      val r = run(name).collect()
      assert(r.length == 1)
      (r.head.getAs[Long]("n_cells"), r.head.getAs[Long]("n_ref"),
        r.head.getAs[Long]("n_cur"), r.head.getAs[Double]("psi"),
        r.head.getAs[Double]("psi_floor"), r.head.getAs[String]("drift_band"))
    }
    val d = one("sim_codebook_drift")
    val p = one("param_codebook_drift")
    // both splits cover the whole corpus through the same codebook
    val n = Tables.embeddings(spark, sf).count()
    assert(d._2 + d._3 == n && p._2 + p._3 == n)
    assert(d._1 == p._1, "the two monitors must share one frozen codebook")
    // PSI is nonnegative by construction; the floor re-derives
    Seq(d, p).foreach { t =>
      assert(t._4 >= 0.0)
      val floor = BigDecimal((t._1 - 1).toDouble *
        (1.0 / t._2 + 1.0 / t._3))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(t._5 == floor)
      val band = if (t._4 < t._5 * 2) "stable"
        else if (t._4 < t._5 * 6) "moderate" else "shifted"
      assert(t._6 == band)
    }
    // the null hypothesis reads stable; the genuine directional
    // shift escalates past it and carries more PSI
    assert(d._6 == "stable", s"null split drifted: $d")
    assert(p._6 != "stable", s"directional split read stable: $p")
    assert(p._4 > d._4)
  }

  test("H1 brute force: exactly k ranked neighbors per query, no self-match") {
    val df = run("sim_topk_bruteforce").cache()
    val perQ = df.groupBy("qid").count()
    assert(perQ.filter(col("count") =!= 10).count() == 0)
    assert(df.filter(col("qid") === col("vec_id")).count() == 0)
    df.unpersist()
  }

  test("H2 cosine pairs: all above threshold, ordered, consistent with H1 top hit") {
    val df = run("sim_cosine_pairs").cache()
    assert(df.filter(col("cosine") < 0.35 || col("cosine") > 1.0000001).count() == 0)
    assert(df.filter(col("vec_a") >= col("vec_b")).count() == 0)
    assert(df.count() > 0, "synthetic corpus has pairs above 0.35")
    df.unpersist()
  }

  test("H20 MMR selection equals the greedy trajectory replayed on the driver") {
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.round(x.toDouble * 10000.0)).toArray)
      .toMap
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val nsq = vecs.map { case (id, v) => id -> dot(v, v) }
    def cos(a: Long, na: Long, nb: Long): Double =
      a.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = (0L until 8L).flatMap { qid =>
      val pool = vecs.keys.filter(_ != qid).toSeq
        .map(id => (id, dot(vecs(qid), vecs(id))))
        .sortBy { case (id, d) => (-d, id) }.take(20)
        .map { case (id, d) => id -> cos(d, nsq(qid), nsq(id)) }
      val rel = pool.toMap
      var selected = Vector.empty[Long]
      (1 to 5).map { step =>
        val (pick, score) =
          if (step == 1) {
            val (id, r) = pool.maxBy { case (id, r) => (r, -id) }
            (id, 0.5 * r)
          } else {
            pool.filterNot { case (id, _) => selected.contains(id) }
              .map { case (id, r) =>
                val maxsim = selected.map(s =>
                  cos(dot(vecs(id), vecs(s)), nsq(id), nsq(s))).max
                (id, 0.5 * r - 0.5 * maxsim)
              }.maxBy { case (id, sc) => (sc, -id) }
          }
        selected :+= pick
        (qid, step, pick, r6(score))
      }
    }
    val got = run("sim_mmr_select").collect().map { r =>
      (r.getAs[Long]("qid"), r.getAs[Int]("step"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("mmr_score"))
    }.toSeq
    assert(got == want)
  }

  test("H22 Rocchio feedback equals the two-round expansion replayed on the driver") {
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.round(x.toDouble * 10000.0)).toArray)
      .toMap
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val want = (0L until 8L).flatMap { qid =>
      val r1 = vecs.keys.filter(_ != qid).toSeq
        .map(id => (id, dot(vecs(qid), vecs(id))))
        .sortBy { case (id, d) => (-d, id) }.take(10).map(_._1)
      val qe = vecs(qid).indices.map(i =>
        10L * vecs(qid)(i) + r1.map(vecs(_)(i)).sum).toArray
      vecs.keys.filter(_ != qid).toSeq
        .map(id => (id, dot(qe, vecs(id))))
        .sortBy { case (id, d) => (-d, id) }.take(10).zipWithIndex
        .map { case ((id, d), i) =>
          (qid, i + 1, id, d, r1.contains(id)) }
    }
    val got = run("sim_rocchio_feedback").collect().map { r =>
      (r.getAs[Long]("qid"), r.getAs[Int]("rank"), r.getAs[Long]("vec_id"),
        r.getAs[Long]("dot_exp"), r.getAs[Boolean]("was_seed"))
    }.toSeq
    assert(got == want)
    // the expansion surfaces at least one non-seed result somewhere OR
    // confirms all seeds — either way was_seed must be consistent
    assert(got.nonEmpty)
  }

  test("H3 LSH ANN: ranked, no self-match, recall beats empty") {
    val ann = run("sim_lsh_ann").cache()
    val brute = run("sim_topk_bruteforce").cache()
    assert(ann.filter(col("qid") === col("vec_id")).count() == 0)
    // recall@10 vs the exact top-10 (quantized-dot ranks ~ cosine ranks
    // on unit-norm vectors)
    val hits = ann.join(brute, Seq("qid", "vec_id"), "left_semi").count()
    val total = brute.count()
    val recall = hits.toDouble / total
    assert(recall >= 0.05, s"LSH multiprobe recall $recall too low")
    ann.unpersist(); brute.unpersist()
  }

  test("H4 IVF probe: each query probes <= 2 cells, recall beats empty") {
    val ivf = run("sim_ivf_probe").cache()
    val brute = run("sim_topk_bruteforce").cache()
    val cellsPerQ = ivf.groupBy("qid").agg(countDistinct("cell").as("nc"))
    assert(cellsPerQ.filter(col("nc") > 2).count() == 0)
    val hits = ivf.join(brute, Seq("qid", "vec_id"), "left_semi").count()
    val recall = hits.toDouble / brute.count()
    assert(recall >= 0.05, s"IVF probe recall $recall too low")
    ivf.unpersist(); brute.unpersist()
  }

  test("H16 binary quantization: driver-recomputed fingerprints, ranked rescore, recall beats empty") {
    val df = run("sim_binary_quantized").cache()
    val brute = run("sim_topk_bruteforce").cache()
    // exactly K ranked rows per query, rank follows cosine desc
    assert(df.groupBy("qid")
      .agg(count(lit(1)).as("n"), max("rank").as("m"))
      .filter(col("n") =!= 10 || col("m") =!= 10).count() == 0)
    assert(df.filter(col("qid") === col("vec_id")).count() == 0)
    // recall vs exact top-10 (rescore from a hamming candidate set)
    val recall = df.join(brute, Seq("qid", "vec_id"), "left_semi").count()
      .toDouble / brute.count()
    assert(recall >= 0.05, s"binary-quantization recall $recall too low")
    // driver-recompute the 60-bit sign fingerprint from raw floats
    // for a few vectors and check hamming consistency with the query
    // fingerprints the operator used
    val emb = Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).take(60).zipWithIndex.map { case (x, i) =>
          if (math.round(x.toDouble * 10000.0) >= 0L) 1L << i else 0L
        }.sum).toMap
    // hamming(q, v) emitted by the operator must equal the driver's
    // bit_count(xor) for pairs where both ids < 10
    val pairs = df.filter(col("qid") < 10 && col("vec_id") < 10)
      .select("qid", "vec_id", "hamming").collect()
    pairs.foreach { r =>
      val want = java.lang.Long.bitCount(emb(r.getLong(0)) ^ emb(r.getLong(1)))
      assert(r.getLong(2) == want.toLong,
        s"hamming mismatch for (${r.getLong(0)},${r.getLong(1)})")
    }
    df.unpersist(); brute.unpersist()
  }

  test("H6 ivf kmeans: dense ranks, bounded cells, probes limited to 2 cells") {
    val df = run("sim_ivf_kmeans").cache()
    // dense ranks 1..n per query, n <= K
    assert(df.groupBy("qid")
      .agg(count(lit(1)).as("n"), max("rank").as("m"))
      .filter(col("n") =!= col("m") || col("m") > 10).count() == 0)
    // each query saw candidates from at most NProbeCells cells
    assert(df.groupBy("qid")
      .agg(countDistinct("cell").as("nc"))
      .filter(col("nc") > 2).count() == 0)
    // trained centroid ids are a subset of vec ids (cells keep the
    // id of the seed centroid they refined) — checked by anti-join
    val vecIds = Tables.embeddings(spark, sf).select(col("vec_id"))
    assert(df.select(col("cell").as("vec_id")).distinct()
      .join(vecIds, Seq("vec_id"), "left_anti").count() == 0)
    assert(df.select("cell").distinct().count() <= 256)
    // the trained index still finds true neighbors: nonzero recall
    val brute = run("sim_topk_bruteforce").select(col("qid"), col("vec_id"))
    val hits = df.join(brute, Seq("qid", "vec_id"), "left_semi").count()
    assert(hits > 0, "kmeans IVF found no true top-k neighbors at all")
    df.unpersist()
  }

  test("H5 recall eval: per-query recall in [0,1] and consistent with raw joins") {
    val df = run("sim_recall_eval").cache()
    assert(df.count() == 48,
      "8 queries x 6 methods (lsh, ivf, ivf_kmeans, pq, sq8, bq)")
    assert(df.filter(col("recall_at_k") < 0 || col("recall_at_k") > 1).count() == 0)
    assert(df.filter(col("recall_at_k") =!=
      col("hits").cast("double") / 10).count() == 0)
    // the eval must agree with computing the overlap directly
    val bf = run("sim_topk_bruteforce").select(col("qid"), col("vec_id"))
    val lshHits = bf.join(run("sim_lsh_ann").select(col("qid"), col("vec_id")),
      Seq("qid", "vec_id")).count()
    assert(df.filter(col("method") === "lsh")
      .agg(sum("hits")).head.getLong(0) == lshHits)
    df.unpersist()
  }

  test("custom expressions are SQL-registered via GraftExtensions") {
    val r = spark.sql(
      """SELECT long_vector_dot(array(1L, 2L), array(3L, 4L)) AS d,
        |  float_vector_dot(array(CAST(1.5 AS FLOAT)), array(CAST(2.0 AS FLOAT))) AS f
        |""".stripMargin).head()
    assert(r.getLong(0) == 11L && r.getDouble(1) == 3.0)
    // th=1 (bit0), th=3 (bits 0,1): bit0 votes 2/2 -> set; bit1 1/2 -> tie, clear
    val s = spark.sql("SELECT simhash_agg(th) AS sh FROM VALUES (1L), (3L) AS t(th)")
    assert(s.head().getLong(0) == 1L)
  }

  test("H1 plan: query side broadcast, no shuffle of the corpus for the join") {
    val df = run("sim_topk_bruteforce")
    val p = flattenPlan(executedPlan(df))
    assert(p.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec]))
  }

  test("H7 PQ/ADC: k rows per query, ADC score matches a driver recompute") {
    val df = run("sim_pq_adc").cache()
    assert(df.groupBy("qid").count().filter(col("count") =!= 10).count() == 0)
    assert(df.filter(col("qid") === col("vec_id")).count() == 0)
    // rebuild the whole PQ pipeline on the driver from raw embeddings
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.round(x.toDouble * 10000.0)).toArray)
      .toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val cbIds = vecs.keys.toSeq.sortBy(id => (md5hex(id.toString), id)).take(16)
    def sub(v: Array[Long], m: Int): Array[Long] = v.slice(m * 8, m * 8 + 8)
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    def adc(q: Array[Long], v: Array[Long]): Long =
      (0 until 8).map { m =>
        val best = cbIds.minBy { cid =>
          val c = sub(vecs(cid), m)
          (dot(c, c) - 2 * dot(sub(v, m), c), cid)
        }
        dot(sub(q, m), sub(vecs(best), m))
      }.sum
    val top = df.filter(col("qid") === 0 && col("rank") === 1).head
    assert(top.getAs[Long]("approx_dot") == adc(vecs(0L), vecs(top.getAs[Long]("vec_id"))))
    df.unpersist()
  }

  test("H15 IVF-PQ residual: k per query, probed-cell containment, ADC matches driver") {
    val df = run("sim_ivfpq_residual").cache()
    assert(df.groupBy("qid").count().filter(col("count") =!= 10).count() == 0)
    assert(df.filter(col("qid") === col("vec_id")).count() == 0)
    // full driver rebuild: centroids, assignment, residuals, residual
    // codebook, encoding, and the IP-ADC decomposition
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.round(x.toDouble * 10000.0)).toArray)
      .toMap
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    def cos(d: Long, na: Long, nb: Long): Double =
      d.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
    val k = math.min(256, math.max(8, math.ceil(math.sqrt(vecs.size.toDouble)).toInt))
    val centIds = vecs.keys.toSeq.sortBy(id => md5hex(id.toString)).take(k)
    val nsq = vecs.map { case (id, v) => id -> dot(v, v) }
    def nearestCell(id: Long): Long =
      centIds.minBy(c => (-cos(dot(vecs(id), vecs(c)), nsq(id), nsq(c)), c))
    val resid = vecs.map { case (id, v) =>
      id -> v.zip(vecs(nearestCell(id))).map { case (a, b) => a - b }
    }
    val rcbIds = vecs.keys.toSeq.sortBy(id => (md5hex(id.toString), id)).take(16)
    def sub(v: Array[Long], m: Int): Array[Long] = v.slice(m * 8, m * 8 + 8)
    def adcScore(qid: Long, vid: Long): Long = {
      val cd = dot(vecs(qid), vecs(nearestCell(vid)))
      cd + (0 until 8).map { m =>
        val best = rcbIds.minBy { cid =>
          val c = sub(resid(cid), m)
          (dot(c, c) - 2 * dot(sub(resid(vid), m), c), cid)
        }
        dot(sub(vecs(qid), m), sub(resid(best), m))
      }.sum
    }
    val rows = df.filter(col("qid") === 0).collect()
    // every returned vector sits in a cell that query 0 probes
    val probed = centIds
      .sortBy(c => (-cos(dot(vecs(0L), vecs(c)), nsq(0L), nsq(c)), c)).take(2).toSet
    rows.foreach { r =>
      assert(probed(r.getAs[Long]("cell")), s"unprobed cell in $r")
      assert(r.getAs[Long]("cell") == nearestCell(r.getAs[Long]("vec_id")))
    }
    // the served score IS the decomposed centroid-dot + LUT sum
    val top = rows.minBy(_.getAs[Int]("rank"))
    assert(top.getAs[Long]("approx_dot") == adcScore(0L, top.getAs[Long]("vec_id")))
    df.unpersist()
  }

  test("H8 MaxSim: k ranked rows per query, no self, dominates the full dot") {
    val ms = run("sim_maxsim_multivec").collect()
    val byQ = ms.groupBy(_.getAs[Long]("qid"))
    assert(byQ.forall(_._2.length == 10))
    assert(ms.forall(r => r.getAs[Long]("qid") != r.getAs[Long]("vec_id")))
    // sum of per-segment maxima >= sum of aligned-segment dots = full
    // dot product — check against H1's exact dots on shared pairs
    val h1 = run("sim_topk_bruteforce").collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id")) -> r.getAs[Long]("dot"))
      .toMap
    val shared = ms.flatMap { r =>
      h1.get((r.getAs[Long]("qid"), r.getAs[Long]("vec_id")))
        .map(d => (r.getAs[Long]("maxsim"), d))
    }
    assert(shared.nonEmpty)
    shared.foreach { case (maxsim, dot) => assert(maxsim >= dot) }
  }

  test("H9 range search: all above threshold, superset of H2 pairs touching a query") {
    val rs = run("sim_range_search").collect()
    assert(rs.nonEmpty)
    assert(rs.forall(_.getAs[Double]("cosine") >= 0.2))
    assert(rs.forall(r => r.getAs[Long]("qid") != r.getAs[Long]("vec_id")))
    val got = rs.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    // H2's all-pairs set (cosine >= 0.35 > 0.2): any pair involving a
    // query id must appear here, in the query->neighbor orientation
    val h2 = run("sim_cosine_pairs").collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")))
    val expected = h2.flatMap { case (a, b) =>
      Seq(a -> b, b -> a).filter(_._1 < 8)
    }.toSet
    assert(expected.nonEmpty && expected.subsetOf(got))
  }

  test("H10 filtered search: only en-doc vectors returned, scores match H1") {
    val fs = run("sim_filtered_search").collect()
    assert(fs.nonEmpty)
    val en = Tables.documents(spark, sf).filter(col("lang") === "en")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(fs.forall(r => en.contains(r.getAs[Long]("vec_id"))))
    // shared (qid, vec_id) pairs must score identically to H1
    val h1 = run("sim_topk_bruteforce").collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id")) -> r.getAs[Long]("dot"))
      .toMap
    val shared = fs.flatMap(r =>
      h1.get((r.getAs[Long]("qid"), r.getAs[Long]("vec_id")))
        .map(d => (r.getAs[Long]("dot"), d)))
    shared.foreach { case (a, b) => assert(a == b) }
  }

  test("H11 pooled search: k per query, no self, pooling matches a driver recompute") {
    val rows = run("sim_pooled_search").collect()
    assert(rows.groupBy(_.getAs[Long]("qid")).forall(_._2.length == 10))
    assert(rows.forall(r => r.getAs[Long]("qid") != r.getAs[Long]("vec_id")))
    // recompute the pooled dot for the top pair of query 0 from raw vectors
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def pooled(id: Long): Array[Long] = {
      val q = vecs(id).map(x => math.round(x.toDouble * 10000.0))
      Array.tabulate(16) { j =>
        val s = (0 until 4).map(i => q(i * 16 + j)).sum
        math.floor(s.toDouble / 4).toLong
      }
    }
    val top = rows.filter(r => r.getAs[Long]("qid") == 0 && r.getAs[Int]("rank") == 1).head
    val want = pooled(0L).zip(pooled(top.getAs[Long]("vec_id")))
      .map { case (a, b) => a * b }.sum
    assert(top.getAs[Long]("dot") == want)
  }

  test("H12 rerank pipeline: k per query from PQ candidates, recall >= PQ-only") {
    val rr = run("sim_rerank_pipeline").cache()
    val pq = run("sim_pq_adc").cache()
    val brute = run("sim_topk_bruteforce").cache()
    // k ranked rows per query, no self, all drawn from the 30 PQ candidates
    assert(rr.groupBy("qid").count().filter(col("count") =!= 10).count() == 0)
    assert(rr.filter(col("qid") === col("vec_id")).count() == 0)
    assert(rr.filter(col("approx_rank") > 30).count() == 0)
    // exact re-rank of a candidate superset can only improve recall:
    // every ground-truth member of the candidate set survives the
    // exact top-k, while PQ's own top-k keeps only an approx-ranked
    // subset of the same candidates
    val rrHits = rr.join(brute, Seq("qid", "vec_id"), "left_semi").count()
    val pqHits = pq.join(brute, Seq("qid", "vec_id"), "left_semi").count()
    assert(rrHits >= pqHits, s"rerank recall $rrHits < pq recall $pqHits")
    rr.unpersist(); pq.unpersist(); brute.unpersist()
  }

  test("H13 SQ8: k per query, no self, code dot matches a driver recompute") {
    val rows = run("sim_sq8").collect()
    assert(rows.groupBy(_.getAs[Long]("qid")).forall(_._2.length == 10))
    assert(rows.forall(r => r.getAs[Long]("qid") != r.getAs[Long]("vec_id")))
    // recompute the quantization + code dot for query 0's top hit
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val absmax = vecs.values.flatten.map(x => math.abs(x.toDouble)).max
    def code(id: Long): Array[Long] =
      vecs(id).map(x => math.round(x.toDouble * 127.0 / absmax))
    val top = rows.filter(r => r.getAs[Long]("qid") == 0 && r.getAs[Int]("rank") == 1).head
    val want = code(0L).zip(code(top.getAs[Long]("vec_id")))
      .map { case (a, b) => a * b }.sum
    assert(top.getAs[Long]("dot") == want)
  }

  test("H14 hybrid RRF: fusion law holds against the component rankings") {
    import org.apache.spark.sql.functions._
    val res = run("sim_hybrid_rrf").collect()
    assert(res.length == 10)
    assert(res.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to 10))
    // component lists, recomputed through the same library calls
    val lex = graft.operators.TextAnalysis.bm25TopK(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("rank")).toMap
    // rrf = 1/(60+lex_rank) + 1/(60+vec_rank) with missing-list terms 0
    res.foreach { r =>
      val lr = Option(r.getAs[Any]("lex_rank")).map(_.toString.toInt)
      val vr = Option(r.getAs[Any]("vec_rank")).map(_.toString.toInt)
      assert(lr.isDefined || vr.isDefined)
      val expect = BigDecimal(
        lr.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
          vr.map(x => 1.0 / (60 + x)).getOrElse(0.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("rrf") - expect) < 1e-12)
      // a served lex_rank must agree with the BM25 list itself (top-10
      // of the fused list only ever cites ranks the components served)
      lr.foreach { x =>
        assert(lex.get(r.getAs[Long]("id")).contains(x) || x > 10,
          s"id ${r.getAs[Long]("id")}: lex_rank $x disagrees with BM25 top-10")
      }
    }
    // fused scores are non-increasing in rank
    val ordered = res.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("rrf"))
    assert(ordered.zip(ordered.tail).forall { case (a, b) => a >= b })
  }

  test("quadratic baselines are refused when graft.allowQuadraticBaselines=false") {
    spark.conf.set("graft.allowQuadraticBaselines", "false")
    try {
      intercept[IllegalStateException](run("sim_cosine_pairs"))
      intercept[IllegalStateException](run("dedup_ngram_jaccard"))
    } finally spark.conf.set("graft.allowQuadraticBaselines", "true")
    // default-on: constructing the plan works again
    assert(run("sim_cosine_pairs").columns.contains("cosine"))
  }
  test("H17 MRL eval: truncated recall matches a driver recompute, degrades with dims") {
    val rows = run("sim_mrl_eval").collect()
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.round(x.toDouble * 10000.0)).toArray)
      .toMap
    val dim = vecs.values.head.length
    def topk(slice: Int): Map[Long, Set[Long]] =
      (0L until 8L).map { qid =>
        val q = vecs(qid).take(slice)
        qid -> vecs.toSeq.filter(_._1 != qid)
          .map { case (id, v) =>
            (id, v.take(slice).zip(q).map { case (a, b) => a * b }.sum)
          }
          .sortBy { case (id, d) => (-d, id) }.take(10).map(_._1).toSet
      }.toMap
    val full = topk(dim)
    for (f <- Seq(2, 4)) {
      val trunc = topk(dim / f)
      rows.filter(_.getAs[String]("method") == s"d/$f").foreach { r =>
        val qid = r.getAs[Long]("qid")
        val want = (full(qid) & trunc(qid)).size.toLong
        assert(r.getAs[Long]("hits") == want, s"d/$f qid $qid")
        assert(r.getAs[Double]("recall_at_k") == want.toDouble / 10)
      }
    }
    // the eval sees real degradation: mean recall at d/4 is below d/2
    def mean(m: String) = {
      val v = rows.filter(_.getAs[String]("method") == m)
        .map(_.getAs[Double]("recall_at_k"))
      v.sum / v.length
    }
    assert(mean("d/4") <= mean("d/2"), "deeper truncation cannot help on average")
    assert(mean("d/2") < 1.0, "fixture must exercise recall loss")
  }

  test("H18 kNN classify: confusion matrix matches a driver replay of the vote") {
    val rows = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => math.round(x.toDouble * 10000.0)).toArray,
        r.getInt(2)))
    val nEval = 40
    val (q, train) = rows.partition(_._1 < nEval)
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val want = q.map { case (_, qv, tl) =>
      val top = train.map(t => (dot(qv, t._2), t._1, t._3))
        .sortBy(t => (-t._1, t._2)).take(10)
      val votes = top.groupBy(_._3).view.mapValues(_.size).toSeq
        .sortBy(v => (-v._2, v._1))
      (tl, votes.head._1)
    }.groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy(p => (p._1._1, p._1._2))
      .map { case ((t, p), n) => (t, p, n) }
    val got = operators.Similarity.knnClassify(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == want)
    // sanity: every eval vector classified exactly once
    assert(got.map(_._3).sum == q.length.toLong)
  }

  test("H21 classifier metrics: trace/marginal laws and the macro-F1 re-derive") {
    val conf = run("sim_knn_classify").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val rows = run("sim_classifier_metrics").collect()
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // marginals and TP re-derive from the confusion matrix
    val nTrue = conf.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val nPred = conf.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val tp = conf.filter(c => c._1 == c._2).map(c => c._1 -> c._3).toMap
    var f1s = List.empty[Double]
    rows.foreach { r =>
      val l = r.getAs[Int]("label")
      assert(r.getAs[Long]("n_true") == nTrue.getOrElse(l, 0L))
      assert(r.getAs[Long]("n_pred") == nPred.getOrElse(l, 0L))
      assert(r.getAs[Long]("tp") == tp.getOrElse(l, 0L))
      val p = if (r.getAs[Long]("n_pred") > 0)
        r.getAs[Long]("tp").toDouble / r.getAs[Long]("n_pred") else 0.0
      val rc = if (r.getAs[Long]("n_true") > 0)
        r.getAs[Long]("tp").toDouble / r.getAs[Long]("n_true") else 0.0
      assert(r.getAs[Double]("precision") == r6(p))
      assert(r.getAs[Double]("recall") == r6(rc))
      val f1 = if (p + rc > 0.0) 2.0 * p * rc / (p + rc) else 0.0
      assert(r.getAs[Double]("f1") == r6(f1))
      f1s ::= r.getAs[Double]("f1")
    }
    // macro-F1 = exact-decimal mean of the served per-class F1s
    val macroF1 = r6(f1s.map(BigDecimal(_).setScale(6,
      BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / f1s.length)
    assert(rows.forall(_.getAs[Double]("macro_f1") == macroF1))
    // trace conservation: sum of TPs = correctly classified queries
    assert(rows.map(_.getAs[Long]("tp")).sum ==
      conf.filter(c => c._1 == c._2).map(_._3).sum)
  }

  test("H23 index refresh: merged index == full rebuild, delta encode is O(|delta|)") {
    val served = run("sim_index_refresh")
    val rows = served.collect()
    assert(rows.nonEmpty)
    // (a) incremental merge == full rebuild under the frozen codebook:
    // re-assign the WHOLE corpus against the same frozen centroids in
    // one pass and search — must equal the served base∪delta merge
    val (splitId, cents, _) =
      operators.Similarity.refreshBaseParts(spark, sf, 80)
    val emb = Tables.embeddings(spark, sf).count()
    assert(splitId == emb * 80 / 100)
    val full = operators.Similarity.fullRebuildSearch(spark, sf, 80)
    assert(served.drop("src").except(full).count() == 0 &&
      full.except(served.drop("src")).count() == 0,
      "incremental merge diverges from full rebuild")
    // (b) the day-2 delta encode reads ONLY the delta slice: its scan
    // carries the pushed vec_id >= split filter
    val deltaPlan = operators.Similarity
      .deltaEncodePlanProbe(spark, sf, 80)
    val scan = flattenPlan(executedPlan(deltaPlan)).collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    val pushed = scan.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("GreaterThanOrEqual(vec_id"),
      s"delta scan filter not pushed: $pushed")
    // (c) the refreshed index actually serves delta hits, and every
    // src flag is consistent with the split boundary
    rows.foreach { r =>
      val isBase = r.getAs[Long]("vec_id") < splitId
      assert(r.getAs[String]("src") == (if (isBase) "base" else "delta"))
    }
    assert(rows.exists(_.getAs[String]("src") == "delta"),
      "no delta vector reachable through the merged index")
    // the frozen codebook is base-only: no centroid id in the delta
    assert(cents.filter(col("cent_id") >= splitId).count() == 0)
  }

  test("H27 staleness recall: ceiling bound, truth-delta law, fresh == H23-serve recount") {
    val rows = run("sim_staleness_recall").collect()
    val k = 10
    val bf = run("sim_topk_bruteforce").collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id")))
    val n = Tables.embeddings(spark, sf).count()
    val splitId = n * 80 / 100
    val tdelta = bf.filter(_._2 >= splitId).groupBy(_._1)
      .view.mapValues(_.length.toLong).toMap
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // every query appears in both states
    val qids = bf.map(_._1).distinct
    assert(rows.length == qids.length * 2)
    rows.foreach { r =>
      val qid = r.getAs[Long]("qid")
      val hits = r.getAs[Long]("hits")
      val td = tdelta.getOrElse(qid, 0L)
      assert(r.getAs[Long]("n_truth_delta") == td, s"truth-delta law: $qid")
      assert(hits >= 0 && hits <= k)
      assert(r.getAs[Double]("recall_at_k") == r6(hits.toDouble / k))
      assert(r.getAs[Double]("stale_ceiling") == r6((k - td).toDouble / k))
      // a base-only index cannot serve truth that lives in the delta
      if (r.getAs[String]("index_state") == "stale")
        assert(hits <= k - td, s"stale hits above the ceiling for $qid")
    }
    // fresh hits recount exactly against the (oracle-checked) H23
    // merged serve — the fresh state IS that index
    val h23 = run("sim_index_refresh").collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val bfSet = bf.toSet
    rows.filter(_.getAs[String]("index_state") == "fresh").foreach { r =>
      val qid = r.getAs[Long]("qid")
      val want = bf.count(t => t._1 == qid && h23(t)).toLong
      assert(r.getAs[Long]("hits") == want, s"fresh recount diverges for $qid")
    }
    // staleness is a real phenomenon at this SF: some truth lives in
    // the delta somewhere (20% of the corpus is unindexed)
    assert(tdelta.values.sum > 0)
  }

  test("H24 tombstone read: soft delete == rebuild on survivors, frozen codebook") {
    val served = run("sim_index_tombstone")
    val rows = served.collect()
    assert(rows.nonEmpty)
    // no tombstoned posting can surface through the soft-deleted read
    assert(rows.forall(_.getAs[Long]("vec_id") % 7 != 3))
    // filter-after-assign == assign-after-filter: the posting-level
    // delete filter serves exactly what a rebuild on the surviving
    // corpus (same frozen codebook) would
    val rebuilt = operators.Similarity.tombstoneRebuildProbe(spark, sf)
    assert(served.except(rebuilt).count() == 0 &&
      rebuilt.except(served).count() == 0,
      "soft-deleted read diverges from rebuild on survivors")
    // the delete is live: at least one H23 result row was a casualty
    val undeleted = run("sim_index_refresh").drop("src")
      .collect().map(_.toSeq).toSet
    assert(rows.map(_.toSeq).toSet != undeleted,
      "tombstones removed nothing from the served top-k")
  }

  test("H25 compaction planner: integer-exact flags, conservation, compacted read == soft-deleted read") {
    val plan = run("sim_index_compaction")
    val rows = plan.collect()
    assert(rows.nonEmpty)
    // conservation per cell, and the flag is the pure integer decision
    rows.foreach { r =>
      val (np, nb, nd) = (r.getAs[Long]("n_postings"),
        r.getAs[Long]("n_base"), r.getAs[Long]("n_delta"))
      val (nt, nl) = (r.getAs[Long]("n_tomb"), r.getAs[Long]("n_live"))
      assert(np == nb + nd && np == nt + nl)
      assert(r.getAs[Boolean]("needs_compaction") == (nt * 10000L >= np * 1500L))
    }
    // posting totals reconcile with the corpus: every vector lives in
    // exactly one cell
    val n = Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_postings")).sum == n)
    // the threshold discriminates at this layout (a work list that
    // flags everything or nothing proves nothing)
    val flags = rows.map(_.getAs[Boolean]("needs_compaction")).toSet
    assert(flags == Set(true, false), s"degenerate work list: $flags")
    // the hinge: physically rebuilding flagged cells + read-filtering
    // kept cells serves exactly the H24 soft-deleted read
    val compacted = operators.Similarity.compactedReadProbe(spark, sf)
    val soft = run("sim_index_tombstone")
    assert(compacted.except(soft).count() == 0 &&
      soft.except(compacted).count() == 0,
      "compacted read diverges from the soft-deleted read")
  }

  test("H19 kNN graph: bucketed all-corpus top-k matches a driver replay") {
    val rows = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => math.round(x.toDouble * 10000.0)).toArray))
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    // replicate the md5-derived hyperplanes (Similarity.planes)
    val md = java.security.MessageDigest.getInstance("MD5")
    val planes = (0 until 4).map { p =>
      (0 until 64).map { j =>
        val h = md.digest(s"$p:$j".getBytes("UTF-8"))
          .take(8).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL)) & Long.MaxValue
        (h % 2001L) - 1000L
      }.toArray
    }
    def bucket(v: Array[Long]): Int =
      planes.zipWithIndex.map { case (pl, i) =>
        if (dot(v, pl) > 0L) 1 << i else 0 }.sum
    val byBucket = rows.groupBy(r => bucket(r._2))
    val want = byBucket.values.toSeq.flatMap { bs =>
      bs.toSeq.flatMap { case (src, sv) =>
        val sn = math.sqrt(dot(sv, sv).toDouble)
        bs.toSeq.filter(_._1 != src)
          .map { case (dst, dv) =>
            (src, dst, dot(sv, dv).toDouble /
              (sn * math.sqrt(dot(dv, dv).toDouble))) }
          .sortBy(t => (-t._3, t._2)).take(10).zipWithIndex
          .map { case ((s, d, c), i) => (s, i + 1, d, c) }
      }
    }.toSet
    val got = run("sim_knn_graph").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == want)
    // graph law: ranks dense 1..k per present node, never a self-edge
    assert(got.forall { case (s, rk, d, _) => s != d && rk >= 1 && rk <= 10 })
  }
}
