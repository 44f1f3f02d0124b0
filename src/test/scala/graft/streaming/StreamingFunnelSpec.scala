package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingFunnelSpec extends AnyFunSuite with SparkTestBase {

  private def t(s: String) = Timestamp.valueOf(s)

  private def drive(batches: Seq[Seq[(Long, Timestamp, Int)]]): Seq[(Long, Int, Long)] = {
    import spark.implicits._
    val mem = MemoryStream[(Long, Timestamp, Int)](spark)
    val out = StreamingFunnel.progression(
      mem.toDF().toDF("user_id", "ts", "stage"), nStages = 3)
    val q = out.writeStream.outputMode("update").format("memory")
      .queryName("funnel_prog").start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    spark.table("funnel_prog")
      .select("user_id", "steps_completed", "t_last_us")
      .as[(Long, Int, Long)].collect().toSeq
  }

  test("progress emits once per batch a user advances; order enforced") {
    val us = (s: String) => t(s).getTime * 1000L
    val got = drive(Seq(
      // batch 1: user 1 views; user 2 clicks without viewing (no progress)
      Seq((1L, t("2024-01-01 10:00:00"), 0), (2L, t("2024-01-01 10:00:00"), 1)),
      // batch 2: user 1 clicks+purchases in one batch → one emit at stage 3
      Seq((1L, t("2024-01-01 10:05:00"), 1), (1L, t("2024-01-01 10:06:00"), 2)),
      // batch 3: user 2 finally views → stage 1
      Seq((2L, t("2024-01-01 11:00:00"), 0))))
    assert(got.toSet == Set(
      (1L, 1, us("2024-01-01 10:00:00")),
      (1L, 3, us("2024-01-01 10:06:00")),
      (2L, 1, us("2024-01-01 11:00:00"))))
  }

  test("in-order streaming equals the batch funnel") {
    import spark.implicits._
    // Deterministic pseudo-random event log, streamed in 4 ts-ordered
    // batches vs the batch operator on the same rows.
    val rows = (0 until 400).map { i =>
      val user = (i * 13 % 23).toLong
      val ts = new Timestamp(1700000000000L + i * 60000L)
      val stage = (i * 7 + user) % 4 match { case 3 => 0; case s => s.toInt }
      (user, ts, stage)
    }
    val streamed = drive(rows.sortBy(_._2.getTime).grouped(100).toSeq)
      .groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).max }
    val batch = graft.ops.Funnel.steps(
      rows.toDF("user_id", "ts", "stage").withColumn("event_id", lit(0L)),
      "user_id", "ts", Seq("event_id"),
      Seq(col("stage") === 0, col("stage") === 1, col("stage") === 2))
      .select("user_id", "steps_completed")
      .as[(Long, Long)].collect().toMap
    streamed.foreach { case (u, s) => assert(batch(u) == s.toLong, s"user $u") }
    // Users who never progressed past 0 emit nothing in the stream.
    batch.filter(_._2 == 0L).keys.foreach(u => assert(!streamed.contains(u)))
  }
}
