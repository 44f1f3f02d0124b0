package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Stream-static enrichment and Spark's native session_window — the two
  * §2.7 streaming shapes not covered elsewhere. Stream-static joins need
  * no watermark or state: the static side is (broadcast-)joined per
  * micro-batch, which is exactly how a streaming parse enriches against
  * a dimension like the item-mapping table.
  */
class StreamEnrichmentSpec extends AnyFunSuite with SparkTestBase {

  private def t(s: String) = Timestamp.valueOf(s)

  test("stream-static broadcast join enriches each micro-batch; unmatched keys survive") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "Whip"), (2L, "Bow")).toDF("item_id", "item_name")

    val mem = MemoryStream[(Long, Double)](spark)
    val enriched = mem.toDF().toDF("item_id", "price")
      .join(broadcast(dim), Seq("item_id"), "left")
    val q = enriched.writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    mem.addData((1L, 10.0), (3L, 7.5))
    q.processAllAvailable()
    mem.addData((2L, 4.0)) // second batch joins the same static dim
    q.processAllAvailable(); q.stop()

    val got = spark.table("enrich_out")
      .select("item_id", "item_name").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(got == Set((1L, Some("Whip")), (3L, None), (2L, Some("Bow"))))
  }

  test("native session_window matches the batch gap-sessionization counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)](spark)
    val sessions = mem.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode("complete").start()
    // User 7: two events 10 min apart (one session), then a 2-hour gap
    // (new session). User 8: one event.
    mem.addData(
      (7L, t("2024-01-01 10:00:00")), (7L, t("2024-01-01 10:10:00")),
      (7L, t("2024-01-01 12:30:00")), (8L, t("2024-01-01 11:00:00")))
    q.processAllAvailable(); q.stop()

    val got = spark.table("sess_out")
      .select("user_id", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toList.sorted
    assert(got == List((7L, 1L), (7L, 2L), (8L, 1L)))

    // Same grouping through the batch sessionizer (TimeSeries.sessionize).
    val batch = graft.ops.TimeSeries.sessionize(
      Seq((7L, t("2024-01-01 10:00:00")), (7L, t("2024-01-01 10:10:00")),
        (7L, t("2024-01-01 12:30:00")), (8L, t("2024-01-01 11:00:00")))
        .toDF("user_id", "ts"), "user_id", "ts", 1800L)
      .groupBy("user_id", "session_id").count()
      .select("user_id", "count").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toList.sorted
    assert(batch == got)
  }
}
