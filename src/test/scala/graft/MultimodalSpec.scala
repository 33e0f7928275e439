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
}
