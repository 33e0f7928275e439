package graft

import org.apache.spark.sql.functions._

/** Specs for the training-corpus preparation slice (SURVEY §2.M). */
class CorpusSpec extends SparkSpecBase {

  test("P5 datasheet: every column re-derives from the owning family's definition") {
    val rows = run("pipeline_corpus_datasheet").collect()
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "source", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val bySrc = docs.groupBy(_._2)
    assert(rows.length == bySrc.size)
    def halfUp(p: Long, q: Long): Long = (2 * p * 1000000L + q) / (2 * q)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val g = bySrc(src)
      assert(r.getAs[Long]("n_docs") == g.length)
      assert(r.getAs[Long]("n_chars") == g.map(_._4).sum)
      // dominant language: max count, ties to the smaller lang
      val langN = g.groupBy(_._3).view.mapValues(_.size).toSeq
        .sortBy(t => (-t._2, t._1))
      assert(r.getAs[String]("lang_top") == langN.head._1)
      assert(r.getAs[Long]("lang_top_n") == langN.head._2.toLong)
      assert(r.getAs[Long]("lang_top_micro") ==
        halfUp(langN.head._2.toLong, g.length))
      // compliance columns re-derive from the M1/M18 injection laws
      assert(r.getAs[Long]("n_pii_docs") ==
        g.count(d => d._1 % 3 == 0 || d._1 % 5 == 0))
      assert(r.getAs[Long]("n_secret_docs") ==
        g.count(d => d._1 % 7 == 0 || d._1 % 11 == 0 || d._1 % 13 == 0))
      assert(r.getAs[Long]("url_dup_micro") ==
        halfUp(r.getAs[Long]("n_url_dup_docs"), g.length))
    }
    // URL-dup membership reconciles with the G28 serve globally
    val g28dups = run("dedup_url_canonical").collect()
      .filter(_.getAs[Long]("n_docs") > 1).map(_.getAs[Long]("n_docs")).sum
    assert(rows.map(_.getAs[Long]("n_url_dup_docs")).sum == g28dups)
    assert(g28dups > 0)
  }

  test("M19 DoReMi mix: driver replay of the MW recurrence, monotone in excess") {
    val rows = run("corpus_mix_doremi").collect()
    assert(rows.nonEmpty)
    val k = rows.length
    def r(x: Double, dp: Int) =
      BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP)
    val u0 = r(1.0 / k, 12).toDouble
    // replay the 8-round multiplicative-weights fold exactly as the
    // operator defines it: round-12 decimal state, exact decimal sums
    val excess = rows.map(_.getAs[Double]("excess_surprisal"))
    var w = Array.fill(k)(BigDecimal(u0))
    val alphaSum = Array.fill(k)(BigDecimal(0))
    for (_ <- 1 to 8) {
      val m = w.indices.map(i => r(w(i).toDouble * (1.0 + 0.5 * excess(i)), 12))
      val z = m.sum
      w = w.indices.map(i => r(m(i).toDouble / z.toDouble, 12)).toArray
      w.indices.foreach { i =>
        alphaSum(i) += r(0.99 * w(i).toDouble + 0.01 * u0, 12)
      }
    }
    rows.indices.foreach { i =>
      assert(rows(i).getAs[Double]("doremi_weight") ==
        r(alphaSum(i).toDouble / 8, 6).toDouble,
        s"row $i: served weight diverges from the driver MW replay")
    }
    // weights are a distribution (each alpha_t sums to ~1) and
    // STRICTLY monotone in excess — the DoReMi upweighting property
    // each served weight is round-6, so the sum may drift by up to
    // 5e-7 per source (plus the 1% uniform-smoothing floor is exact)
    val wsum = rows.map(_.getAs[Double]("doremi_weight")).sum
    assert(math.abs(wsum - 1.0) <= 5e-7 * k + 1e-9)
    val byExcess = rows.map(r => (r.getAs[Double]("excess_surprisal"),
      r.getAs[Double]("doremi_weight"))).sortBy(_._1)
    for (i <- 1 until byExcess.length) {
      val ((e1, w1), (e2, w2)) = (byExcess(i - 1), byExcess(i))
      if (e1 < e2) assert(w1 < w2, s"weight not monotone: $e1->$w1 vs $e2->$w2")
    }
    // the param instantiation (eta=0.25, 4 rounds) spreads LESS
    val p = run("param_mix_doremi").collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("doremi_weight"))
      .toMap
    val full = rows.map(r => r.getAs[String]("source") ->
      r.getAs[Double]("doremi_weight")).toMap
    def spread(m: Map[String, Double]) = m.values.max - m.values.min
    assert(spread(p) < spread(full))
  }

  test("P6 release diff: classes partition each release, migrations = stale-clone law") {
    val rows = run("pipeline_corpus_release_diff").collect()
    val ids = Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val bySrc = ids.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    assert(rows.map(_.getAs[String]("source")).toSet == bySrc.keySet)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val g = bySrc(src)
      val (v1, v2main) = (g.filter(_ % 11 != 5), g.filter(_ % 9 != 0))
      val clones = g.filter(_ % 13 == 4)
      def n(c: String) = r.getAs[Long](c)
      // the four classes partition each release exactly
      assert(n("n_v1") == n("n_dropped") + n("n_modified") + n("n_unchanged"))
      assert(n("n_v2") == n("n_added") + n("n_modified") + n("n_unchanged"))
      // each class equals its modular construction law
      assert(n("n_v1") == v1.length)
      assert(n("n_v2") == v2main.length + clones.length)
      assert(n("n_added") ==
        g.count(d => d % 11 == 5 && d % 9 != 0) + clones.length)
      assert(n("n_dropped") == g.count(d => d % 11 != 5 && d % 9 == 0))
      assert(n("n_modified") ==
        g.count(d => d % 11 != 5 && d % 9 != 0 && d % 7 == 3))
      // keeper migration = the stale-clone pathology: content kept
      // alive by a re-ingested copy after its original left or changed
      assert(n("n_keeper_migrated") == g.count(d =>
        d % 11 != 5 && d % 13 == 4 && (d % 9 == 0 || d % 7 == 3)))
    }
    // the plant realizes every class somewhere at this SF
    def tot(c: String) = rows.map(_.getAs[Long](c)).sum
    assert(tot("n_added") > 0 && tot("n_dropped") > 0 &&
      tot("n_modified") > 0 && tot("n_unchanged") > 0)
  }

  test("M18 secret scan: flagged set equals the injected truth, near-misses stay dark") {
    val got = run("corpus_secret_scan").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("rule"),
        r.getAs[Long]("n_docs_flagged"), r.getAs[Long]("n_hits"),
        r.getAs[Long]("n_injected"),
        Option(r.getAs[java.lang.Double]("flag_ratio")).map(_.toDouble)))
    assert(got.nonEmpty)
    // the detector hits EXACTLY the injected docs: no missed leak, no
    // near-miss false positive (the planted too-short key bodies)
    got.foreach { case (src, rule, flagged, hits, injected, ratio) =>
      assert(flagged == injected, s"($src,$rule): flagged != injected")
      assert(hits == injected, s"($src,$rule): multi-hit or miss")
      assert(injected == 0 || ratio.contains(1.0))
      assert(injected > 0 || ratio.isEmpty)
    }
    // per-rule totals equal the modular injection law
    val ids = Tables.documents(spark, sf)
      .select("doc_id").collect().map(_.getLong(0))
    val byRule = got.groupBy(_._2).view.mapValues(_.map(_._5).sum).toMap
    assert(byRule("aws_key") == ids.count(_ % 7 == 0))
    assert(byRule("private_key") == ids.count(_ % 11 == 0))
    assert(byRule("hex_token") == ids.count(_ % 13 == 0))
    // every (source, rule) cell is served, even all-zero ones
    val nSources = Tables.documents(spark, sf)
      .select("source").distinct().count()
    assert(got.length == nSources * 3)
    // the relaxed param threshold (32-hex) still flags exactly the
    // planted 40-hex tokens: the 16-hex near-miss stays dark
    val p = run("param_secret_scan").collect()
      .map(r => (r.getAs[String]("rule"), r.getAs[Long]("n_docs_flagged"),
        r.getAs[Long]("n_injected")))
      .filter(_._1 == "hex_token")
    assert(p.nonEmpty && p.forall(t => t._2 == t._3))
  }

  test("M17 cluster sample: balanced caps, deterministic prefix picks, full-cover strata") {
    val rows = run("corpus_cluster_sample").collect()
      .map(r => (r.getAs[Long]("cluster"), r.getAs[Long]("n_members"),
        r.getAs[Long]("vec_id"), r.getAs[Int]("pick_rank")))
    assert(rows.nonEmpty)
    val byCluster = rows.groupBy(_._1)
    byCluster.foreach { case (c, g) =>
      val n = g.head._2
      assert(g.forall(_._2 == n), s"cluster $c: inconsistent n_members")
      // kept = min(cap, n_members), ranks contiguous from 1
      assert(g.map(_._4).sorted.toSeq == (1 to math.min(8L, n).toInt))
      // no vector sampled twice
      assert(g.map(_._3).distinct.length == g.length)
    }
    // strata cover the corpus: members across clusters = all vectors
    assert(byCluster.values.map(_.head._2).sum ==
      Tables.embeddings(spark, sf).count())
    // density flattening is live: some cluster was capped
    assert(byCluster.values.exists(_.head._2 > 8))
    // determinism: the cap-3 sample is EXACTLY the pick_rank<=3 prefix
    // of the cap-8 sample (same codebook, same hash order)
    val small = run("param_cluster_sample").collect()
      .map(r => (r.getAs[Long]("cluster"), r.getAs[Long]("vec_id"),
        r.getAs[Int]("pick_rank"))).toSet
    val prefix = rows.filter(_._4 <= 3).map(t => (t._1, t._3, t._4)).toSet
    assert(small == prefix, "cap-3 picks are not a prefix of cap-8 picks")
  }

  test("M1 pii redact: no email/phone survives, counts match injections") {
    val df = run("corpus_pii_redact").cache()
    assert(df.filter(col("redacted").rlike("@")).count() == 0)
    assert(df.filter(col("redacted").rlike("[0-9]{3}-[0-9]{3}-[0-9]{4}")).count() == 0)
    // every 3rd doc got an email, every 5th a phone
    val n = df.count()
    assert(df.agg(sum("n_emails")).head.getLong(0) == (n + 2) / 3)
    assert(df.agg(sum("n_phones")).head.getLong(0) == (n + 4) / 5)
    assert(df.filter(col("n_emails") > 0 &&
      !col("redacted").contains("[EMAIL]")).count() == 0)
    df.unpersist()
  }

  test("M1 pii redact plan: narrow scan-project, no shuffle") {
    assert(!flattenPlan(executedPlan(run("corpus_pii_redact"))).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike]))
  }

  test("M2 chunking: stride/size invariants and full coverage") {
    val df = run("corpus_chunk").cache()
    assert(df.filter(col("n_chunk_tokens") < 1 ||
      col("n_chunk_tokens") > 32).count() == 0)
    // chunk ids are dense 0..last
    assert(df.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), (max("chunk_id") + 1).as("m"))
      .filter(col("n") =!= col("m")).count() == 0)
    // exact size law: chunk i covers tokens [i*stride, min(i*stride+32, n))
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), c => c =!= "")).as("n_toks"))
    val joined = df.join(docs, "doc_id")
    assert(joined.filter(col("n_chunk_tokens") =!=
      least(lit(32), col("n_toks") - col("chunk_id") * 24)).count() == 0)
    // coverage: some chunk reaches the last token of every doc
    assert(joined.groupBy("doc_id", "n_toks")
      .agg(max(col("chunk_id") * 24 + col("n_chunk_tokens")).as("covered"))
      .filter(col("covered") =!= col("n_toks")).count() == 0)
    df.unpersist()
  }

  test("M3 stratified sample: deterministic, rates near targets, en downsampled") {
    val a = run("corpus_sample_stratified").cache()
    val total = Tables.documents(spark, sf).groupBy("lang").count()
      .withColumnRenamed("count", "n_all")
    val kept = a.groupBy("lang").count().withColumnRenamed("count", "n_kept")
    val rates = kept.join(total, "lang")
      .withColumn("rate", col("n_kept").cast("double") / col("n_all"))
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Double]("rate")).toMap
    assert(rates("en") < 0.45, s"en rate ${rates("en")} should be ~0.25")
    assert(rates.filterKeys(_ != "en").values.forall(r => r > 0.5),
      s"non-en rates $rates should be ~0.75")
    // deterministic: same rows on a second evaluation
    val b = run("corpus_sample_stratified")
    assert(a.select("doc_id").exceptAll(b.select("doc_id")).count() == 0)
    a.unpersist()
  }

  test("M4 packing: offsets are exact prefix sums, sequences consistent") {
    val df = run("corpus_pack").cache()
    // offset(doc) = offset(prev) + n_tokens(prev) in doc_id order
    val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
    val chained = df
      .withColumn("expected", coalesce(lag(col("token_offset") + col("n_tokens"), 1).over(w), lit(0L)))
    assert(chained.filter(col("token_offset") =!= col("expected")).count() == 0)
    assert(df.filter(col("seq_last") < col("seq_first")).count() == 0)
    assert(df.filter(col("seq_first") =!=
      floor(col("token_offset") / 256).cast("long")).count() == 0)
    df.unpersist()
  }

  test("M5 source cap: never more than 15 docs per source, deterministic picks") {
    val a = run("corpus_source_cap").cache()
    assert(a.groupBy("source").count().filter(col("count") > 15).count() == 0)
    // sources under the cap keep everything
    val totals = Tables.documents(spark, sf).groupBy("source").count()
      .withColumnRenamed("count", "n_all")
    val kept = a.groupBy("source").count().withColumnRenamed("count", "n_kept")
    assert(kept.join(totals, "source")
      .filter(col("n_all") <= 15 && col("n_kept") =!= col("n_all")).count() == 0)
    val b = run("corpus_source_cap")
    assert(a.select("doc_id").exceptAll(b.select("doc_id")).count() == 0)
    a.unpersist()
  }

  test("M6 mix weights: shares sum to 1, weights invert the actual share") {
    val rows = run("corpus_mix_weights").collect()
    val shareSum = rows.map(_.getAs[Double]("actual_share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-4, s"shares sum to $shareSum")
    rows.foreach { r =>
      val expected = r.getAs[Double]("target_share") / r.getAs[Double]("actual_share")
      assert(math.abs(r.getAs[Double]("weight") - expected) < 1e-3,
        s"weight off for ${r.getAs[String]("lang")}")
    }
  }

  test("M12 temperature mix: shares renormalize, low-resource langs upsample") {
    val rows = run("corpus_temperature_mix").collect()
    val qSum = rows.map(_.getAs[Double]("temperature_share")).sum
    assert(math.abs(qSum - 1.0) < 1e-4, s"temperature shares sum to $qSum")
    // alpha < 1 flattens the distribution: every lang below the
    // natural-share mean gains (factor > 1), the largest lang loses
    val top = rows.maxBy(_.getAs[Double]("natural_share"))
    assert(top.getAs[Double]("upsample_factor") < 1.0,
      s"largest lang ${top.getAs[String]("lang")} should downsample")
    rows.filter(_.getAs[Double]("natural_share") <
        rows.map(_.getAs[Double]("natural_share")).min * 1.0001)
      .foreach { r =>
        assert(r.getAs[Double]("upsample_factor") > 1.0,
          s"smallest lang ${r.getAs[String]("lang")} should upsample")
      }
  }

  test("M7 resample: copy counts bracket the weight, per-lang mean approaches it") {
    val df = run("corpus_resample").cache()
    val w = run("corpus_mix_weights")
      .select(col("lang"), col("weight"), col("n_docs"))
    // per-doc law: n_copies in {floor(w), floor(w)+1}
    val perDoc = df.groupBy("doc_id", "lang").agg(max("n_copies").as("nc"))
      .join(w, "lang")
    assert(perDoc.filter(col("nc") < floor(col("weight")) ||
      col("nc") > floor(col("weight")) + 1).count() == 0)
    // per-lang realized mean copies within 0.15 of the target weight
    val real = df.groupBy("lang").count().join(w, "lang")
      .withColumn("mean_copies", col("count").cast("double") / col("n_docs"))
    assert(real.filter(abs(col("mean_copies") - col("weight")) > 0.15).count() == 0,
      real.collect().mkString(";"))
    // deterministic
    val again = run("corpus_resample")
    assert(df.exceptAll(again).count() == 0 && again.exceptAll(df).count() == 0)
    df.unpersist()
  }

  test("M4 packing plan: prefix scan is two-level, no corpus-wide single-partition window") {
    // the only partition-less window may run over the tiny blocks
    // table (#blocks rows), never over the documents themselves: the
    // doc-level window must be partitioned (by block)
    val df = run("corpus_pack")
    val windows = flattenPlan(executedPlan(df)).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty)
    // identify the doc-level window by its INPUT carrying doc_id (the
    // window outputs themselves are renamed _weN by
    // ExtractWindowExpressions, so matching on token_offset would
    // never fire and the assertion would be vacuous)
    val docLevel = windows.filter(_.output.exists(_.name == "doc_id"))
    assert(docLevel.nonEmpty, "expected a window over the document rows")
    assert(docLevel.forall(_.partitionSpec.nonEmpty),
      "doc-level running sum must be partitioned by block")
  }

  test("M16 contrastive triplets equal a full driver replay of the mining") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // trigram shingle sets, 60-token cap (the G19 definition)
    val shingleSets = docs.map { case (id, t, _) =>
      val w = t.split(" ").filter(_.nonEmpty).take(60)
      id -> w.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }.toMap
    val ids = docs.map(_._1).sorted
    val pos = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      inter = (shingleSets(a) & shingleSets(b)).size
      if inter > 0
      jac = inter.toDouble / (shingleSets(a).size + shingleSets(b).size - inter)
      if jac >= 0.5
    } yield ((a, b), jac)).toMap
    val posd = pos.toSeq
      .flatMap { case ((a, b), j) => Seq(a -> (b, j), b -> (a, j)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val chars = docs.map(d => d._1 -> d._3).toMap
    // cyclic next-doc-by-id inside the n_chars÷16 bucket
    val nextInBucket = docs.groupBy(_._3 / 16).values.flatMap { g =>
      val sorted = g.map(_._1).sorted
      sorted.zip(sorted.drop(1) :+ sorted.head)
    }.toMap
    val want = posd.toSeq.map { case (anchor, partners) =>
      val (positive, jac) = partners.sortBy { case (pid, j) => (-j, pid) }.head
      val neg = nextInBucket(anchor)
      (anchor, positive, jac, neg)
    }.filter { case (a, _, _, neg) =>
      neg != a && !posd(a).exists(_._1 == neg)
    }.sortBy(_._1).map { case (a, p, j, n) =>
      (a, p, j, n, math.abs(chars(a) - chars(n)))
    }
    val got = run("corpus_contrastive_triplets").collect().map { r =>
      (r.getAs[Long]("anchor"), r.getAs[Long]("positive"),
        r.getAs[Double]("jaccard_pos"), r.getAs[Long]("negative"),
        r.getAs[Long]("neg_chars_delta"))
    }.toSeq
    assert(got == want)
    assert(got.nonEmpty)
    // triplet contract: anchor, positive, negative all distinct; the
    // negative is never itself a near-dup of the anchor
    got.foreach { case (a, p, _, n, _) =>
      assert(a != p && a != n && p != n)
      assert(!pos.contains((math.min(a, n), math.max(a, n))))
    }
  }

  test("M15 balanced shards: snake assignment matches driver, mass balanced") {
    val toks = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").count(_.nonEmpty).toLong))
    val s = 8L
    val expected = toks.sortBy { case (id, n) => (-n, id) }.zipWithIndex
      .map { case ((id, n), i) =>
        val pos = i % s
        val shard = if ((i / s) % 2 == 0) pos else s - 1 - pos
        (shard, n)
      }.groupBy(_._1).map { case (sh, xs) =>
        (sh, xs.length.toLong, xs.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    val got = run("corpus_balanced_shards").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    // balance: every shard's token mass within one max-doc of perfect
    val masses = got.map(_._3)
    val maxDoc = toks.map(_._2).max
    assert(masses.max - masses.min <= maxDoc * 2,
      s"shard imbalance ${masses.max - masses.min} exceeds 2x max doc $maxDoc")
    // accounting: nothing dropped
    assert(masses.sum == toks.map(_._2).sum)
    assert(got.map(_._2).sum == toks.length.toLong)
  }

  test("M15 plan: the size rank is two-level, no corpus-wide single-partition window") {
    val df = run("corpus_balanced_shards")
    val windows = flattenPlan(executedPlan(df)).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty)
    val docLevel = windows.filter(_.output.exists(_.name == "doc_id"))
    assert(docLevel.nonEmpty, "expected a window over the document rows")
    assert(docLevel.forall(_.partitionSpec.nonEmpty),
      "doc-level rank must be partitioned by token-count bucket")
  }

  test("M8 leak-free split: covers all docs, no near-dup edge straddles the boundary") {
    val split = run("corpus_split_leakfree").cache()
    assert(split.count() == Tables.documents(spark, sf).count())
    assert(split.select("split").distinct().count() == 2, "both splits non-empty")
    // the whole point: a near-dup pair must never span train and val
    val pairs = operators.Dedup.ngramJaccard(spark, sf).select("doc_a", "doc_b")
    val sa = split.select(col("doc_id").as("doc_a"), col("split").as("split_a"))
    val sb = split.select(col("doc_id").as("doc_b"), col("split").as("split_b"))
    val straddling = pairs.join(sa, "doc_a").join(sb, "doc_b")
      .filter(col("split_a") =!= col("split_b"))
    assert(straddling.count() == 0, "near-dup pair split across train/val")
    // roughly 90/10 by group (md5 threshold 'e6' = 230/256)
    val frac = split.filter(col("split") === "train").count().toDouble / split.count()
    assert(frac > 0.8 && frac < 0.98, s"train fraction $frac out of band")
    split.unpersist()
  }

  test("M9 quality funnel: every doc gets exactly one verdict, rules fire in order") {
    val rows = run("corpus_quality_funnel").collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    val verdicts = rows.map(_.getAs[String]("verdict")).toSet
    assert(verdicts.subsetOf(Set("keep", "too_short", "too_repetitive", "too_punct")))
    assert(verdicts.contains("keep"), "funnel should keep most of this corpus")
    // first-failing-rule ordering: any doc labeled too_repetitive or
    // too_punct must NOT also be too_short
    rows.filter(r => r.getAs[String]("verdict") != "too_short")
      .foreach(r => assert(r.getAs[Int]("n_words") >= 10))
  }

  test("M11 token budget: two-level scan equals the naive global-window selection") {
    import org.apache.spark.sql.expressions.Window
    val sel = run("corpus_token_budget").cache()
    // the served two-level prefix scan must select EXACTLY the set a
    // naive single-partition global window would (the correctness
    // definition the scalable plan re-expresses)
    val base = Tables.documents(spark, sf)
      .select(col("doc_id"),
        expr("filter(split(text, ' '), x -> x != '')").as("w"))
      .select(col("doc_id"), size(col("w")).as("n_tokens"),
        size(array_distinct(col("w"))).as("n_distinct"))
      .filter(col("n_tokens") > 0)
      .withColumn("quality",
        col("n_distinct").cast("double") / col("n_tokens").cast("double"))
    val wg = Window.orderBy(col("quality").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val naive = base
      .withColumn("token_offset",
        coalesce(sum(col("n_tokens")).over(wg), lit(0L)))
      .filter(col("token_offset") < 10000L)
      .select(col("doc_id"), col("token_offset"))
    val mismatch = sel.select(col("doc_id"), col("token_offset"))
      .unionAll(naive).groupBy("doc_id", "token_offset")
      .count().filter(col("count") =!= 2)
    assert(mismatch.count() == 0, "two-level scan diverges from global window")
    // budget law: selection fills the budget but starts under it
    val offPlus = sel.agg(max(col("token_offset") + col("n_tokens"))).head.getLong(0)
    assert(offPlus >= 10000L, "selection should exhaust the budget on this corpus")
    sel.unpersist()
  }

  test("M10 shuffle shards: dense positions per shard, deterministic across runs") {
    val a = run("corpus_shuffle_shards").collect()
    assert(a.length == Tables.documents(spark, sf).count())
    assert(a.forall(r => r.getAs[Long]("shard") >= 0 && r.getAs[Long]("shard") < 64))
    a.groupBy(_.getAs[Long]("shard")).foreach { case (_, rs) =>
      val ps = rs.map(_.getAs[Int]("pos")).sorted
      assert(ps.toSeq == (1 to rs.length), "positions must be dense 1..n per shard")
    }
    // reproducible: same corpus -> identical order
    val b = run("corpus_shuffle_shards").collect()
    assert(a.map(_.toSeq).toSet == b.map(_.toSeq).toSet)
  }

  test("M13 length buckets: caps are tight powers of two, waste beats naive") {
    val rows = run("corpus_length_buckets").collect()
    assert(rows.nonEmpty)
    val toks = Tables.documents(spark, sf).select(col("text")).collect()
      .map(_.getString(0).split(" ").count(_.nonEmpty).toLong)
    def cap(n: Long) = if (n <= 16) 16L
      else { var c = 16L; while (c < n) c <<= 1; c }
    val want = toks.groupBy(cap).view
      .mapValues(ns => (ns.length.toLong, ns.sum)).toMap
    assert(rows.length == want.size)
    var padded = 0L
    rows.foreach { r =>
      val c = r.getAs[Long]("bucket_cap")
      val (n, s) = want(c)
      assert(r.getAs[Long]("n_docs") == n && r.getAs[Long]("sum_tokens") == s)
      assert(r.getAs[Long]("padded_tokens") == c * n - s)
      padded += c * n - s
    }
    // bucketing must strictly beat pad-to-global-max on this corpus
    val naive = toks.max * toks.length - toks.sum
    assert(padded < naive)
    assert(rows.forall(r =>
      r.getAs[Double]("waste_frac") < r.getAs[Double]("naive_waste_frac")))
  }

  test("M14 weighted sample equals the A-ES race replayed on the driver") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(docId: Long, w: Long): BigDecimal = {
      val hex = md.digest(s"ws:$docId".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val u = (java.lang.Long.parseLong(hex, 16) + 1L) / 1152921504606846976.0
      BigDecimal(-math.log(u) / w).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }
    val expected = docs.map { case (id, w) => (id, key(id, w)) }
      .sortBy { case (id, k) => (k, id) }.take(50).map(_._1).toSeq
    val got = operators.Corpus.weightedSample(spark, sf, k = 50)
      .collect().map(_.getLong(0)).toSeq
    assert(got == expected)
    // length bias: weight = n_chars, so long docs win the race more
    // often — the sample's mean length must exceed the corpus mean
    val byId = docs.toMap
    val sampleMean = expected.map(byId).sum.toDouble / expected.size
    val corpusMean = docs.map(_._2).sum.toDouble / docs.length
    assert(sampleMean > corpusMean,
      s"no length bias: sample $sampleMean vs corpus $corpusMean")
  }
}
