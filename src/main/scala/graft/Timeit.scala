package graft

/** Dev tool: time (and optionally explain) individual queries from
  * SparkEntry at a given SF dir — the per-query slice of Bench for
  * plan iteration. Usage:
  *   runMain graft.Timeit <sfDir> [-x] <queryName>...
  * -x additionally prints the formatted executed plan.
  */
object Timeit {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val explain = args.contains("-x")
    val noCse = args.contains("-nocse")
    val names = args.drop(1).filterNot(a => a == "-x" || a == "-nocse")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Engine.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    Engine.configure(spark)
    // same measurement-time conf overrides as Bench ("k=v;k=v")
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').filter(_.contains('='))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2); spark.conf.set(k.trim, v.trim)
      })
    // -nocse simulates degraded codegen subexpression elimination — a
    // plan is only scale-robust if it stays fast with CSE off
    if (noCse) spark.conf.set("spark.sql.subexpressionElimination.enabled", "false")
    spark.sparkContext.setLogLevel("ERROR")
    // warm the JVM/codegen paths (same as Bench)
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().write.mode("overwrite").format("noop").save()
    names.foreach { n =>
      // time construction + action: several registry queries (the
      // streaming twins, eval composites) do their real work eagerly
      // inside fn() — Bench times fn().write as one region, so must we
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, sfDir)
      val tBuild = (System.nanoTime - t0) / 1e9
      df.write.mode("overwrite").format("noop").save()
      val tAll = (System.nanoTime - t0) / 1e9
      println(f"TIMEIT $n $tAll%.3f s (build $tBuild%.3f)")
      if (explain) df.explain("formatted")
    }
    spark.stop()
  }
}
