package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Engine.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    Engine.configure(spark)
    // warm the JVM/codegen paths so the first measured query doesn't
    // absorb session startup (~3-4 s of JIT + codegen compile)
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag").count().write.mode("overwrite").format("noop").save()
    // noop sink: materializes every row and column (count() would let
    // Catalyst prune computed columns away and under-measure).
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name: $e")
        failed += name
      }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    // a crashing query usually "finishes" fast — marking it in the
    // JSON keeps a failure from masquerading as a fast pass.
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fl = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fl,"sf":"$sfDir"}""")
    spark.stop()
  }
}
