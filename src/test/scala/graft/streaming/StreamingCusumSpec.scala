package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingCusumSpec extends AnyFunSuite with SparkTestBase {

  private def drive(name: String, target: Long, threshold: Long,
      batches: Seq[Seq[(String, Long, Long)]]): Seq[(String, Long, Long, Long, Boolean)] = {
    import spark.implicits._
    val mem = MemoryStream[(String, Long, Long)](spark)
    val out = StreamingCusum.monitor(
      mem.toDF().toDF("key", "t", "value"), target, threshold)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name)
      .select("key", "t", "cusum_high", "cusum_low", "alarm")
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
      .sortBy(r => (r._1, r._2))
  }

  test("bit-identical to the batch closed form over the same prefix") {
    import spark.implicits._
    val rows = (0 until 120).map(i =>
      (s"k${i % 3}", i.toLong, ((i * 31) % 20 - 7).toLong))
    // Stream in three arbitrary batch splits; batch form sees all rows.
    val streamed = drive("cusum_parity", 2L, 25L,
      Seq(rows.take(40), rows.slice(40, 90), rows.drop(90)))
    val batch = graft.ops.TimeSeries.cusum(
        rows.toDF("k", "t", "v"), "k", "t", "v", target = 2L, threshold = 25L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSeq.sortBy(r => (r._1, r._2))
    assert(streamed == batch)
  }

  test("a sustained small shift alarms across batches via state") {
    // 10 on-target points, then +5 drift arriving in a LATER batch: the
    // ramp must continue from state (5, 10, 15 > 12 at the third point).
    val base = (1 to 10).map(i => ("s", i.toLong, 10L))
    val drift = (11 to 14).map(i => ("s", i.toLong, 15L))
    val got = drive("cusum_shift", 10L, 12L, Seq(base, drift))
    val byT = got.map(r => r._2 -> ((r._3, r._5))).toMap
    assert((1 to 10).forall(t => byT(t.toLong) == ((0L, false))))
    assert(byT(11L) == ((5L, false)) && byT(12L) == ((10L, false)))
    assert(byT(13L) == ((15L, true)) && byT(14L) == ((20L, true)))
  }

  test("keys are isolated and negative shifts alarm on the low side") {
    val rows = Seq(("a", 1L, 0L), ("a", 2L, 0L), ("b", 1L, 20L)) ++
      (3 to 5).map(i => ("a", i.toLong, -6L))
    val got = drive("cusum_low", 0L, 15L, Seq(rows))
    val a = got.filter(_._1 == "a").map(r => r._2 -> ((r._4, r._5))).toMap
    assert(a(2L) == ((0L, false)))
    assert(a(4L) == ((12L, false)) && a(5L) == ((18L, true)))
    // b's single high point doesn't leak into a.
    val b = got.filter(_._1 == "b")
    assert(b.map(r => (r._3, r._4)) == Seq((20L, 0L)))
  }

  test("rejects non-positive threshold") {
    import spark.implicits._
    val df = Seq(("a", 1L, 1L)).toDF("key", "t", "value")
    intercept[IllegalArgumentException] {
      StreamingCusum.monitor(df, 0L, 0L)
    }
  }
}
