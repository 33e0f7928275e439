package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val spark = Engine.builder(master, cpus.toInt).getOrCreate()
    Engine.configure(spark)
    // measurement-time conf overrides ("k=v;k=v") — lets A/B experiments
    // (e.g. graft.read.fanout on/off) reuse the bench methodology
    // without code edits; empty in driver runs, so the contract is
    // unchanged there
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').filter(_.contains('='))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2); spark.conf.set(k.trim, v.trim)
      })
    // warm the JVM/codegen paths so the first measured query doesn't
    // absorb session startup (~3-4 s of JIT + codegen compile)
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().write.mode("overwrite").format("noop").save()
    // noop sink: materializes every row and column (count() would let
    // Catalyst prune computed columns away and under-measure).
    //
    // Median of 3 runs per query, reps INTERLEAVED round-robin: the
    // full query list runs once per rep, not 3x back-to-back per
    // query. Back-to-back reps let one co-tenant load burst hit all
    // three samples of the same query — exactly how BENCH_r06's four
    // slowest medians kept ambient-load pollution (the burst was
    // shorter than a full 164-query pass but longer than 3 reps of
    // one query). Round-robin spacing puts ~minutes between a query's
    // samples, so a burst lands in at most one of them and the median
    // filters it. The first rep is reported separately so cold-cache
    // cost stays visible without polluting the steady-state number.
    val Reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    // optional subset (comma-separated names) — used by the sf1.0
    // scale-validation runs to bench the heavy queries at 10x data
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // Cross-query SHARED caches (graph baskets / pair counts / oriented
    // tables) are materialized BEFORE the timed loop, so each family
    // member's samples measure its own work instead of whichever query
    // runs first absorbing the shared cold build (the BASELINE §1b
    // whipsaw — r12 verdict ask #2). Opt out with
    // SPARK_GRAFT_WARM_SHARED=0 to measure the cold build explicitly.
    if (sys.env.getOrElse("SPARK_GRAFT_WARM_SHARED", "1") == "1" &&
        names.exists { case (n, _) =>
          n.contains("graph_") || n.contains("copurchase") ||
            n.contains("association_rules") })
      try operators.Graph.warmShared(spark, sfDir)
      catch { case e: Throwable => System.err.println(s"[bench] warm: $e") }
    val samples = scala.collection.mutable.LinkedHashMap[String, Vector[Double]](
      names.map { case (n, _) => n -> Vector.empty[Double] }: _*)
    // canary: one fixed cheap NON-REGISTRY plan (the warmup rollup)
    // timed at the top of every rep AND every `CanaryEvery` queries
    // WITHIN the rep (r12 verdict ask #1: three reads only at rep
    // boundaries could not see load arriving mid-run, so two
    // same-commit runs disagreed 5x on sub-second queries). Each
    // query sample records which canary segment it ran under, and the
    // artifact serves BOTH raw medians and per-segment load-normalized
    // medians (sample x runMedianCanary/segmentCanary). Deliberately
    // not a registry query: re-running one would warm its plan and
    // falsify its first_run entry. Guarded like every measured query —
    // a broken canary must not take down the whole artifact.
    val CanaryEvery =
      sys.env.getOrElse("SPARK_GRAFT_CANARY_EVERY", "50").toInt.max(1)
    def canaryFn(): Unit = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count()
      .write.mode("overwrite").format("noop").save()
    // CPU-bound companion canary (r13 verdict ask #2): the read canary
    // under-detects co-tenant CPU bursts — a compute-saturating
    // 32-core query degrades far more than a small scan does. A fixed
    // spin/hash loop on all cores is the probe whose degradation
    // actually tracks compute-bound queries; its series ships in the
    // artifact (`canary_cpu`) so roundclose can refuse a loaded run.
    def canaryCpuFn(): Double = {
      import scala.collection.parallel.CollectionConverters._
      // ~60-80 ms of pure spin per read: long enough that scheduler
      // jitter / GC pauses can't fake a multiple of the median (a 7 ms
      // probe read 4x spreads from noise alone), short enough to cost
      // <2 s over a full-registry run
      (0 until cpus.toInt).par.map { w =>
        var h = 1125899906842597L + w
        var i = 0
        while (i < 30000000) { h = h * 31 + i; i += 1 }
        h.toDouble
      }.sum
    }
    // JIT-warm the spin loop before anything is recorded: its first
    // execution pays ~100 ms of C2 compilation that would read as a
    // 14x head spike and trip roundclose's flat-series guard
    { val s = canaryCpuFn(); if (s == 42.0) println(s) }
    val canary = scala.collection.mutable.ListBuffer.empty[Double]
    val canaryCpu = scala.collection.mutable.ListBuffer.empty[Double]
    val canaryPos = scala.collection.mutable.ListBuffer.empty[String]
    def takeCanary(rep: Int, qIdx: Int): Unit = {
      val c0 = System.nanoTime()
      var ok = true
      try canaryFn()
      catch { case e: Throwable =>
        System.err.println(s"[bench] canary: $e")
        if (!failed.contains("canary")) failed += "canary"
        ok = false
      }
      // a FAILED read records the -1.0 sentinel, never its (possibly
      // tiny) time-to-fail: one fast-failing read would otherwise
      // inflate every sample in its segment by cMed/c (r13 advisor) —
      // sentinel segments normalize with factor 1, as documented
      canary += (if (ok) (System.nanoTime() - c0) / 1e9 else -1.0)
      val u0 = System.nanoTime()
      try { val s = canaryCpuFn(); if (s == 42.0) println(s) }
      catch { case _: Throwable => () }
      canaryCpu += (System.nanoTime() - u0) / 1e9
      canaryPos += s"$rep:$qIdx"
    }
    // per-sample canary segment, parallel to `samples`
    val segs = scala.collection.mutable.LinkedHashMap[String, Vector[Int]](
      names.map { case (n, _) => n -> Vector.empty[Int] }: _*)
    for (rep <- 1 to Reps) {
      names.zipWithIndex.foreach { case ((name, fn), i) =>
        if (i % CanaryEvery == 0) takeCanary(rep, i)
        val seg = canary.length - 1
        val t0 = System.nanoTime()
        try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name: $e")
          if (!failed.contains(name)) failed += name
        }
        samples(name) :+= (System.nanoTime() - t0) / 1e9
        segs(name) :+= seg
      }
    }
    // a crashing query usually "finishes" fast — marking it in the
    // JSON keeps a failure from masquerading as a fast pass.
    val results = samples.map { case (name, ts) =>
      name -> (ts.sorted.apply(ts.length / 2), ts.head)
    }
    // load-normalized medians: each sample scaled by
    // runMedianCanary / itsSegmentCanary, so a burst that inflated one
    // segment deflates exactly the samples taken under it. A failed
    // canary read is the -1.0 sentinel: its segment contributes
    // factor 1 (no correction) and it is EXCLUDED from the run median.
    val cValid = canary.toVector.filter(_ > 0)
    val cMed =
      if (cValid.nonEmpty) cValid.sorted.apply(cValid.length / 2) else 1.0
    val normMed = samples.map { case (name, ts) =>
      val ns = ts.zip(segs(name)).map { case (t, s) =>
        val c = if (s >= 0 && s < canary.length) canary(s) else 0.0
        if (c > 0 && cMed > 0) t * (cMed / c) else t
      }
      name -> ns.sorted.apply(ns.length / 2)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v._1 }
      .mkString("{", ",", "}")
    val firsts = results.map { case (k, v) => s"\"" + k + "\":" + v._2 }
      .mkString("{", ",", "}")
    val qsNorm = normMed.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fl = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val cn = canary.map(t => f"$t%.3f").mkString("[", ",", "]")
    val cu = canaryCpu.map(t => f"$t%.3f").mkString("[", ",", "]")
    val cp = canaryPos.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.map(_._1).sum else 0.0
    val totalNorm = if (normMed.nonEmpty) normMed.values.sum else 0.0
    val fullJson =
      s"""{"metric":"total_median_of_$Reps","value":$total,"unit":"sec","queries":$qs,"first_run":$firsts,"queries_norm":$qsNorm,"value_norm":$totalNorm,"canary":$cn,"canary_cpu":$cu,"canary_pos":$cp,"canary_every":$CanaryEvery,"failed":$fl,"sf":"$sfDir"}"""
    println(fullJson)
    // The driver's BENCH artifact preserves only a bounded stdout
    // TAIL — r07 lost 201 of 252 per-query medians to truncation,
    // blinding cross-round regression diffs. The COMPLETE artifact is
    // therefore also written to a file the repo commits, so every
    // median survives machine-readable regardless of stdout windowing.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (fullJson + "\n").getBytes("UTF-8"))
    catch { case e: Throwable => System.err.println(s"[bench] write $outPath: $e") }
    // compact summary LAST: the driver's artifact keeps the tail of
    // stdout, and the full JSON above can exceed that window — r05's
    // artifact preserved only first-run numbers because `queries`
    // printed first and the medians scrolled out. This line is small
    // enough to always survive, so the signal (medians) is never lost.
    val slowest = results.toSeq.sortBy(-_._2._1).take(10)
      .map { case (k, v) => s"\"" + k + "\":" + f"${v._1}%.3f" }
      .mkString("{", ",", "}")
    println(s"""{"summary":"medians","total_median_sec":$total,"total_norm_sec":$totalNorm,"n_queries":${results.size},"slowest":$slowest,"canary":$cn,"canary_cpu":$cu,"canary_every":$CanaryEvery,"failed":$fl,"bench_out":"$outPath","sf":"$sfDir"}""")
    spark.stop()
  }
}
