package graft.streaming

import scala.collection.mutable

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamingDriftSpec extends AnyFunSuite with SparkTestBase {

  test("per-batch PSI: in-distribution batches quiet, shifted batches loud") {
    import spark.implicits._
    val ref = (0 until 400).map(i => (i % 20).toDouble).toDF("v")
    val mem = MemoryStream[Double](spark)
    val scores = mutable.Map.empty[Long, Double]
    val q = StreamingDrift.monitor(mem.toDF().toDF("v"), ref, "v", nBins = 10) {
      (id, psi) =>
        scores(id) = psi.select("psi_term").collect().map(_.getDouble(0)).sum
    }
    try {
      // Batch 0 mirrors the reference; batch 1 is all top-of-range mass.
      mem.addData((0 until 400).map(i => (i % 20).toDouble): _*)
      q.processAllAvailable()
      mem.addData((0 until 400).map(_ => 19.0): _*)
      q.processAllAvailable()
      // Batch 2 is empty-equivalent: nothing added, no new callback.
      q.processAllAvailable()
    } finally q.stop()
    assert(scores.keySet == Set(0L, 1L))
    assert(scores(0L) < 0.01, s"in-distribution PSI ${scores(0L)}")
    assert(scores(1L) > 0.2, s"shifted PSI ${scores(1L)}")
  }
}
