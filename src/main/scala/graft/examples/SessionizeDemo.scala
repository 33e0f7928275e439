package graft.examples

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamOps
import graft.streaming.StreamOps.Event

/** Minimal runnable example of the streaming sessionizer: feeds a
  * hand-made event stream (including an out-of-order arrival) through
  * MemoryStream and prints the emitted sessions per micro-batch.
  * `sbt "runMain graft.examples.SessionizeDemo"`. */
object SessionizeDemo {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session("sessionize-demo", "4")
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val ms = MemoryStream[Event]
    val q = StreamOps.sessionize(ms.toDS(), spark)
      .writeStream.format("memory").queryName("demo").outputMode("append").start()

    def t(s: String) = Timestamp.valueOf(s)
    // user 1: two sessions separated by a 50-minute gap; user 2: one
    ms.addData(Seq(
      Event(1, t("2024-01-01 10:00:00"), 1, "click", 1.0),
      Event(2, t("2024-01-01 10:10:00"), 1, "click", 2.0),
      Event(3, t("2024-01-01 11:00:00"), 1, "view", 3.0),
      Event(4, t("2024-01-01 10:05:00"), 2, "click", 4.0)))
    q.processAllAvailable()
    // out-of-order arrival that still belongs to user 1's open session
    ms.addData(Seq(Event(5, t("2024-01-01 11:05:00"), 1, "click", 5.0)))
    q.processAllAvailable()
    println("=== emitted so far (closed sessions only):")
    spark.table("demo").orderBy("user_id", "session_start").show(false)
    // a far-future event advances the watermark; event-time timeouts flush
    ms.addData(Seq(Event(99, t("2030-01-01 00:00:00"), -1, "sentinel", 0.0)))
    q.processAllAvailable()
    println("=== after watermark flush (all sessions):")
    spark.table("demo").orderBy("user_id", "session_start").show(false)
    q.stop()
    spark.stop()
  }
}
