package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** [[StreamingIngest.slidingCounts]]: overlapping-window assignment must
  * equal the batch `window()` aggregation, and append mode must emit a
  * window only once the watermark passes its end (state eviction).
  */
class SlidingWindowSpec extends AnyFunSuite with SparkTestBase {

  private def t(s: String) = Timestamp.valueOf(s)

  test("overlap membership equals the batch sliding-window aggregation") {
    import spark.implicits._
    val rows = Seq(
      (t("2024-01-01 01:00:00"), "Drop", 10.0),
      (t("2024-01-01 07:00:00"), "Drop", 5.0),
      (t("2024-01-01 07:30:00"), "PB", 1.0))

    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)](spark)
    val stream = StreamingIngest.slidingCounts(
      mem.toDF().toDF("Timestamp", "Broadcast_Type", "Item_Value"))
    val q = stream.writeStream.format("memory").queryName("slide_complete")
      .outputMode("complete").start()
    mem.addData(rows: _*)
    q.processAllAvailable(); q.stop()

    val got = spark.table("slide_complete")
      .select("win_start", "win_end", "Broadcast_Type", "Count")
      .collect().map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getString(2), r.getLong(3)))
      .toSet

    val batch = rows.toDF("Timestamp", "Broadcast_Type", "Item_Value")
      .groupBy(window(col("Timestamp"), "12 hours", "6 hours"), col("Broadcast_Type"))
      .agg(count(lit(1)).as("Count"))
      .select(col("window.start"), col("window.end"), col("Broadcast_Type"), col("Count"))
      .collect().map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(got == batch)
    // 12h/6h → every event is in exactly two windows.
    assert(got.toSeq.map(_._4).sum == rows.length * 2)
  }

  test("append mode emits a window only after the watermark passes its end") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)](spark)
    val stream = StreamingIngest.slidingCounts(
      mem.toDF().toDF("Timestamp", "Broadcast_Type", "Item_Value"))
    val q = stream.writeStream.format("memory").queryName("slide_append")
      .outputMode("append").start()

    mem.addData((t("2024-01-01 01:00:00"), "Drop", 10.0))
    q.processAllAvailable()
    assert(spark.table("slide_append").count() == 0) // watermark still early

    // Advance event time a day; watermark (max - 10 min) passes both of
    // the first event's window ends on the batch after it is observed.
    mem.addData((t("2024-01-02 00:00:00"), "Drop", 1.0))
    q.processAllAvailable()
    mem.addData((t("2024-01-02 00:30:00"), "Drop", 1.0))
    q.processAllAvailable()
    q.stop()

    val ends = spark.table("slide_append")
      .select("win_end").collect().map(_.getTimestamp(0).toString).toSet
    assert(ends == Set("2024-01-01 06:00:00.0", "2024-01-01 12:00:00.0"))
  }
}
