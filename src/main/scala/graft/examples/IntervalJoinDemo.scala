package graft.examples

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamOps
import graft.streaming.StreamOps.Event

/** Minimal runnable example of the watermarked stream-stream interval
  * join: purchases match same-user clicks from the preceding 30
  * minutes, including a late-arriving click.
  * `sbt "runMain graft.examples.IntervalJoinDemo"`. */
object IntervalJoinDemo {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session("interval-join-demo", "4")
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val msP = MemoryStream[Event]
    val msC = MemoryStream[Event]
    val q = StreamOps.intervalJoin(msP.toDF(), msC.toDF())
      .writeStream.format("memory").queryName("demo_l5")
      .outputMode("append").start()

    def t(s: String) = Timestamp.valueOf(s)
    // user 7: click 10:00 then purchase 10:20 (match) and 11:30 (gap
    // too wide); user 8's purchase arrives BEFORE its matching click
    msC.addData(Seq(Event(1, t("2024-01-01 10:00:00"), 7, "click", 0.0)))
    msP.addData(Seq(
      Event(2, t("2024-01-01 10:20:00"), 7, "purchase", 5.0),
      Event(3, t("2024-01-01 11:30:00"), 7, "purchase", 6.0),
      Event(4, t("2024-01-01 09:30:00"), 8, "purchase", 7.0)))
    q.processAllAvailable()
    // a late click within the 1h watermark lateness still joins:
    // purchase state is retained until the watermark passes (a click
    // older than min(maxSeen)-1h would be dropped instead)
    msC.addData(Seq(Event(5, t("2024-01-01 09:10:00"), 8, "click", 0.0)))
    q.processAllAvailable()
    q.stop()
    println("=== joined purchase-click pairs:")
    spark.table("demo_l5").orderBy("purchase_id").show(false)
    spark.stop()
  }
}
