package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamingAnomalySpec extends AnyFunSuite with SparkTestBase {

  private def ts(i: Int) = new Timestamp(1700000000000L + i * 1000L)

  private def drive(name: String, threshold: Double, minN: Long,
      batches: Seq[Seq[(String, Timestamp, Double)]]): Seq[(String, Double, Double)] = {
    import spark.implicits._
    val mem = MemoryStream[(String, Timestamp, Double)](spark)
    val out = StreamingAnomaly.detect(
      mem.toDF().toDF("key", "ts", "value"), threshold, minN)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name).select("key", "value", "z")
      .as[(String, Double, Double)].collect().toSeq
  }

  test("a level spike flags; steady signal and cold-start do not") {
    val steady = (0 until 20).map(i =>
      ("m", ts(i), 10.0 + (i % 2) * 0.2)) // mean ~10.1, sd ~0.1
    val got = drive("anom1", 4.0, 10L,
      Seq(steady, Seq(("m", ts(30), 25.0), ("m", ts(31), 10.1))))
    assert(got.map(_._2) == Seq(25.0))
    assert(got.head._3 > 4.0)
  }

  test("first minN observations never flag, even if wild") {
    val wild = (0 until 8).map(i => ("k", ts(i), math.pow(-3.0, i)))
    assert(drive("anom2", 2.0, 10L, Seq(wild)).isEmpty)
  }

  test("state carries across batches: the same spike flags only via history") {
    // Split so the spike arrives in its own batch — prior moments must
    // come from state, not the local batch.
    val base = (0 until 12).map(i => ("s", ts(i), 5.0 + (i % 3) * 0.1))
    val got = drive("anom3", 5.0, 10L, Seq(base, Seq(("s", ts(20), 50.0))))
    assert(got.map(r => (r._1, r._2)) == Seq(("s", 50.0)))
    // Keys are independent: an identical but separate key cold-starts.
    val cold = drive("anom4", 5.0, 10L, Seq(Seq(("t", ts(20), 50.0))))
    assert(cold.isEmpty)
  }

  test("a constant history flags its first deviation with infinite z " +
      "instead of silently absorbing it") {
    val constant = (0 until 12).map(i => ("c", ts(i), 5.0))
    val got = drive("anom4", 3.0, 10L,
      Seq(constant, Seq(("c", ts(20), 1000.0), ("c", ts(21), 5.0))))
    assert(got.map(_._2) == Seq(1000.0))
    assert(got.head._3.isPosInfinity)
  }
}
