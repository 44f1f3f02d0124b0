package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamingJoinSpec extends AnyFunSuite with SparkTestBase {

  private def t(s: String) = Timestamp.valueOf(s)

  test("interval join attributes in-window clicks; watermark flushes unmatched as nulls") {
    import spark.implicits._
    val imps = MemoryStream[(Long, Timestamp)](spark)
    val clicks = MemoryStream[(Long, Timestamp)](spark)
    val impDf = imps.toDF().toDF("imp_id", "imp_ts")
    val clickDf = clicks.toDF().toDF("click_imp_id", "click_ts")

    val out = Files.createTempDirectory("graft_ssjoin_out").toString
    val ckpt = Files.createTempDirectory("graft_ssjoin_ckpt").toString
    val q = StreamingJoin.attributedClicks(impDf, clickDf, "10 minutes", "10 minutes")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .start()

    imps.addData(
      (1L, t("2024-01-01 10:00:00")), // clicked in window
      (2L, t("2024-01-01 10:01:00")), // never clicked
      (3L, t("2024-01-01 10:02:00"))) // clicked too late
    clicks.addData(
      (1L, t("2024-01-01 10:05:00")),
      (3L, t("2024-01-01 10:20:00"))) // outside the 10-minute window
    q.processAllAvailable()
    // Advance both watermarks far past every window end so unmatched
    // impressions are flushed as null-click rows.
    imps.addData((99L, t("2024-01-01 12:00:00")))
    clicks.addData((98L, t("2024-01-01 12:00:00")))
    q.processAllAvailable()
    q.stop()

    val rows = spark.read.parquet(out)
      .select("imp_id", "click_ts").collect()
      .map(r => r.getLong(0) -> Option(r.getTimestamp(1))).toMap
    assert(rows(1L).contains(t("2024-01-01 10:05:00")))
    assert(rows(2L).isEmpty, "unclicked impression must flush with null click")
    assert(rows(3L).isEmpty, "out-of-window click must not attribute")
  }
}
