package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

class StreamingSessionizeSpec extends AnyFunSuite with SparkTestBase {

  private def t(s: String) = Timestamp.valueOf(s)

  test("gap-closed sessions stream out; watermark timeout flushes the tail") {
    import spark.implicits._
    val mem = MemoryStream[(Long, Timestamp)](spark)
    val events = mem.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "0 seconds")

    val q = StreamingSessionize.sessions(events, gapSeconds = 1800)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sessions_out").start()

    // User 1: two bursts 2h apart (gap 30 min) → first session closes as
    // soon as the second burst arrives. User 2: one burst.
    mem.addData(
      (1L, t("2024-01-01 10:00:00")), (1L, t("2024-01-01 10:10:00")),
      (2L, t("2024-01-01 11:00:00")))
    q.processAllAvailable()
    mem.addData((1L, t("2024-01-01 12:30:00")), (1L, t("2024-01-01 12:40:00")))
    q.processAllAvailable()

    // User 1's first session closes because the 12:30 event proves the
    // gap; user 2's closes via the event-time TIMEOUT — the second batch
    // advanced the watermark to 12:40, past 11:00 + 30 min.
    val afterGap = spark.table("sessions_out")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
    assert(afterGap.toSet == Set(
      (1L, t("2024-01-01 10:00:00"), t("2024-01-01 10:10:00"), 2L),
      (2L, t("2024-01-01 11:00:00"), t("2024-01-01 11:00:00"), 1L)))

    // Advance the watermark far past every open session's last + gap: the
    // event-time timeout flushes user 1's second session and user 2's only
    // session. (The 99's own session stays open — never flushed here.)
    mem.addData((99L, t("2024-01-02 00:00:00")))
    q.processAllAvailable()
    // One more empty-ish batch so timed-out groups are processed.
    mem.addData((99L, t("2024-01-02 00:00:01")))
    q.processAllAvailable()
    q.stop()

    val all = spark.table("sessions_out")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
    assert(all.toSet.contains(
      (1L, t("2024-01-01 12:30:00"), t("2024-01-01 12:40:00"), 2L)))
    assert(all.toSet.contains(
      (2L, t("2024-01-01 11:00:00"), t("2024-01-01 11:00:00"), 1L)))
  }

  test("cross-batch stragglers: own session beyond the gap, extend within it") {
    import spark.implicits._
    val mem = MemoryStream[(Long, Timestamp)](spark)
    // Generous watermark delay so stragglers are NOT dropped by Spark.
    val events = mem.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "2 hours")

    val q = StreamingSessionize.sessions(events, gapSeconds = 1800)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("straggler_out").start()

    mem.addData((1L, t("2024-01-01 12:00:00")))
    q.processAllAvailable()
    // Straggler 11:00 — more than the 30 min gap BEFORE the in-flight
    // session: becomes its own closed session, not absorbed.
    // Straggler 11:50 — within the gap: extends the session backwards.
    mem.addData((1L, t("2024-01-01 11:00:00")), (1L, t("2024-01-01 11:50:00")))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("straggler_out")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
    assert(rows.toSet == Set(
      (1L, t("2024-01-01 11:00:00"), t("2024-01-01 11:00:00"), 1L)))
    // (the extended 11:50-12:00 session is still open — not emitted)
  }

  test("two stragglers within gap of each other chain into one closed session") {
    import spark.implicits._
    val mem = MemoryStream[(Long, Timestamp)](spark)
    val events = mem.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "4 hours")

    val q = StreamingSessionize.sessions(events, gapSeconds = 1800)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("chain_out").start()

    mem.addData((1L, t("2024-01-01 12:00:00")))
    q.processAllAvailable()
    // Both stragglers are > gap before the 12:00 in-flight session, but
    // within gap (25 min) of EACH OTHER: the chain sweep must merge them
    // into ONE closed session 09:00–09:25, not two singletons (ADVICE r04).
    mem.addData((1L, t("2024-01-01 09:00:00")), (1L, t("2024-01-01 09:25:00")))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("chain_out")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
    assert(rows.toSet == Set(
      (1L, t("2024-01-01 09:00:00"), t("2024-01-01 09:25:00"), 2L)))
  }

  test("windowed counts append a bucket once the watermark passes it") {
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, String, Long)](spark)
    val bc = mem.toDF().toDF("Timestamp", "Broadcast_Type", "Item_Value")

    val q = StreamingIngest.windowedCounts(bc, "6 hours", "10 minutes")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("windowed_out").start()

    mem.addData(
      (t("2024-01-01 01:00:00"), "Valuable Drop", 100L),
      (t("2024-01-01 02:00:00"), "Valuable Drop", 50L),
      (t("2024-01-01 03:00:00"), "Level Up", 0L))
    q.processAllAvailable()
    // Watermark still inside the 00:00-06:00 bucket → nothing emitted yet.
    assert(spark.table("windowed_out").count() == 0)

    mem.addData((t("2024-01-01 07:00:00"), "Level Up", 0L))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("windowed_out")
      .select(col("bucket"), col("Broadcast_Type"), col("Count"), col("Total_Value"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSet == Set(
      (t("2024-01-01 00:00:00"), "Valuable Drop", 2L, 150L),
      (t("2024-01-01 00:00:00"), "Level Up", 1L, 0L)))
  }
}
