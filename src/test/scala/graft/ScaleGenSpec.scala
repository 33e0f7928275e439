package graft

import org.apache.spark.sql.functions._

import graft.tools.ScaleGen

/** Pins the replica properties SCALING_r08.md relies on: a ScaleGen
  * output must behave like a LARGER population, not a duplicated one
  * — FK integrity across the offset keys, linear (not quadratic)
  * near-dup candidate growth, and distribution-preserving embedding
  * decorrelation. */
class ScaleGenSpec extends SparkSpecBase {

  private val R = 3
  private lazy val out: String = {
    val p = s"${System.getProperty("java.io.tmpdir")}/graft_scalegen_spec_" +
      s"${ProcessHandle.current().pid()}"
    ScaleGen.run(spark, sf, p, R)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(p))
    }))
    p
  }

  test("row counts scale by R for fact tables, dims stay fixed") {
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings")) {
      val base = spark.read.parquet(s"$sf/$t.parquet").count()
      val big = spark.read.parquet(s"$out/$t.parquet").count()
      assert(big == base * R, s"$t: $big != $base * $R")
    }
    for (t <- Seq("region", "nation")) {
      assert(spark.read.parquet(s"$out/$t.parquet").count() ==
        spark.read.parquet(s"$sf/$t.parquet").count(), s"$t changed")
    }
  }

  test("FK integrity survives the key offsets") {
    val li = Tables.lineitem(spark, out)
    val orphans = li.join(Tables.orders(spark, out),
        li("l_orderkey") === col("o_orderkey"), "left_anti").count() +
      li.join(Tables.part(spark, out),
        li("l_partkey") === col("p_partkey"), "left_anti").count() +
      li.join(Tables.supplier(spark, out),
        li("l_suppkey") === col("s_suppkey"), "left_anti").count()
    assert(orphans == 0, s"$orphans orphaned lineitem FK references")
    val oOrph = Tables.orders(spark, out).join(Tables.customer(spark, out),
      col("o_custkey") === col("c_custkey"), "left_anti").count()
    assert(oOrph == 0, s"$oOrph orphaned orders.o_custkey")
    // tenancy preserved: the offset is ≡ 0 mod 4
    assert(ScaleGen.Off % 4 == 0)
  }

  test("documents: replicas share zero shingles (near-dup growth is linear)") {
    // word-trigram sets of a replica must be disjoint from replica 0's
    // — this is what keeps candidate pair counts linear in R instead
    // of quadratic (SCALING_r08.md's methodology claim)
    val tri = (d: String) => Tables.documents(spark, d)
      .select(explode(expr(
        """transform(sequence(1, greatest(size(split(text, ' ')) - 2, 0)),
          |  i -> concat_ws(' ', slice(split(text, ' '), i, 3)))""".stripMargin))
        .as("sh"))
    val base = tri(sf).withColumn("rep", lit(0))
    val scaled = tri(out)
    // every base shingle appears exactly R0=1 replica's docs: count
    // distinct shingles — scaled must have ~R times as many (exact
    // R× iff no collision between suffixed and unsuffixed tokens)
    val nBase = base.select(col("sh")).distinct().count()
    val nScaled = scaled.select(col("sh")).distinct().count()
    assert(nScaled == nBase * R,
      s"shingle vocabulary not disjoint across replicas: $nScaled != $nBase * $R")
  }

  test("embeddings: circular shift preserves the norm, decorrelates content") {
    val normOf = (d: String) =>
      Tables.embeddings(spark, d)
        .select(col("vec_id"),
          round(expr("aggregate(embedding, CAST(0.0 AS DOUBLE), " +
            "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"), 4)
            .as("nsq"))
    val base = normOf(sf).withColumnRenamed("nsq", "nsq0")
    val rep1 = normOf(out)
      .filter(col("vec_id") >= ScaleGen.Off && col("vec_id") < 2 * ScaleGen.Off)
      .withColumn("vec_id", col("vec_id") - ScaleGen.Off)
    val joined = base.join(rep1, "vec_id")
    assert(joined.filter(col("nsq0") =!= col("nsq")).count() == 0,
      "replica shift changed a vector norm")
    // decorrelated: the replica vector is NOT equal to its source
    val eq = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding").as("e0"))
      .join(Tables.embeddings(spark, out)
        .filter(col("vec_id") >= ScaleGen.Off && col("vec_id") < 2 * ScaleGen.Off)
        .withColumn("vec_id", col("vec_id") - ScaleGen.Off), "vec_id")
      .filter(col("e0") === col("embedding")).count()
    assert(eq == 0, s"$eq replica vectors identical to their source")
  }

  test("embeddings: replicas past the dimension wrap stay norm-true and distinct") {
    // R=100 regression (r14): the old fixed-k slice had NEGATIVE
    // length for k >= dim (job abort), and k = dim would have been a
    // verbatim copy. The wrap path adds a per-wrap-count hash-picked
    // sign flip — norm preserved, no replica equal to the base or to
    // any other wrap of the same vector.
    import spark.implicits._
    val dim = Tables.embeddings(spark, sf)
      .select(expr("size(embedding)")).head.getInt(0)
    val base = Tables.embeddings(spark, sf).limit(50)
      .select(col("vec_id"), col("embedding"))
    val nsq = (c: String) => round(expr(
      s"aggregate($c, CAST(0.0 AS DOUBLE), " +
        s"(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"), 4)
    for (k <- Seq(dim, dim + 3, 2 * dim, 2 * dim + 7)) {
      val t = base.withColumn("shifted", ScaleGen.shiftEmbedding(k))
      assert(t.filter(nsq("embedding") =!= nsq("shifted")).count() == 0,
        s"k=$k changed a norm")
      assert(t.filter(col("embedding") === col("shifted")).count() == 0,
        s"k=$k produced verbatim copies")
    }
    // distinct across wrap counts too: k=dim vs k=2*dim (same zero
    // shift, different sign pattern)
    val two = base
      .withColumn("a", ScaleGen.shiftEmbedding(dim))
      .withColumn("b", ScaleGen.shiftEmbedding(2 * dim))
    assert(two.filter(col("a") === col("b")).count() == 0,
      "wrap counts 1 and 2 collided")
  }
}
