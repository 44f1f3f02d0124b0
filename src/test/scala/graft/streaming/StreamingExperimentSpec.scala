package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingExperimentSpec extends AnyFunSuite with SparkTestBase {

  private def drive(name: String, tau2: Double,
      batches: Seq[Seq[(String, Boolean, Boolean)]]): Seq[StreamingExperiment.Readout] = {
    import spark.implicits._
    val mem = MemoryStream[(String, Boolean, Boolean)](spark)
    val out = StreamingExperiment.monitor(
      mem.toDF().toDF("exp", "treated", "converted"), tau2)
    val q = out.writeStream.outputMode("append").format("memory")
      .queryName(name).start()
    batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
    q.stop()
    spark.table(name).as[StreamingExperiment.Readout].collect().toSeq
  }

  private def dayUnits(d: Int): Seq[(String, Boolean, Boolean)] =
    (0 until 30).map { i =>
      val t = i % 2 == 1
      ("e1", t, if (t) i % 10 < 8 else i % 10 == 0)
    }

  test("batch-per-day stream is bit-identical to the batch trajectory") {
    import spark.implicits._
    val days = 8
    val streamed = drive("sexp_parity", 1e-2, (0 until days).map(dayUnits))
      .sortBy(r => r.n_c + r.n_t)
    val rows = for (d <- 0 until days; u <- dayUnits(d))
      yield (d.toLong, u._2, u._3)
    val batch = graft.ops.Experiment.msprt(rows.toDF("day", "t", "c"),
        col("t"), col("c"), col("day"), tau2 = 1e-2)
      .orderBy("day").collect()
    assert(streamed.size == days && batch.length == days)
    streamed.zip(batch).foreach { case (s, b) =>
      assert((s.n_c, s.n_t, s.conv_c, s.conv_t) ==
        ((b.getLong(1), b.getLong(2), b.getLong(3), b.getLong(4))))
      // batch emits round(x, 6); the streaming monitor emits raw doubles
      // from the SAME JVM arithmetic — rounding them must reproduce the
      // batch columns exactly.
      def r6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r6(s.log_lambda.get) == b.getDouble(5))
      assert(r6(s.p_av.get) == b.getDouble(6))
    }
  }

  test("p carries across batches, degenerate start emits None, keys isolate") {
    // e2's first batch is all-treatment (degenerate): ll None, p None.
    // Its second batch completes the pool; the third shifts counts — the
    // emitted p must be the RUNNING min (<= the prior batch's), never
    // reset. A separate key e3 arriving late cold-starts independently.
    val b1 = Seq(("e2", true, true), ("e2", true, false))
    val b2 = (0 until 40).map(i => ("e2", i % 2 == 0, i % 3 == 0))
    val b3 = Seq(("e2", false, true), ("e3", true, true))
    val got = drive("sexp_carry", 1e-2, Seq(b1, b2, b3))
    val e2 = got.filter(_.exp == "e2").sortBy(r => r.n_c + r.n_t)
    assert(e2.size == 3)
    assert(e2(0).log_lambda.isEmpty && e2(0).p_av.isEmpty)
    assert(e2(1).p_av.nonEmpty)
    assert(e2(2).p_av.nonEmpty && e2(2).p_av.get <= e2(1).p_av.get)
    // e3: one treated unit only — degenerate, no leak from e2's state.
    val e3 = got.filter(_.exp == "e3")
    assert(e3.size == 1 && e3.head.p_av.isEmpty && e3.head.n_t == 1L)
  }

  test("rejects non-positive tau2") {
    import spark.implicits._
    val df = Seq(("e", true, true)).toDF("exp", "treated", "converted")
    intercept[IllegalArgumentException] {
      StreamingExperiment.monitor(df, 0.0)
    }
  }
}
