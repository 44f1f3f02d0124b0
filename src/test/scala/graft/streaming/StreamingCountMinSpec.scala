package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import graft.text.CountMin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StreamingCountMinSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val batch1 = Seq("a", "b", "a", "c", "a")
  private val batch2 = Seq("b", "a", "d", "d")

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("stream across a restart equals one batch sketch over all rows") {
    val root = Files.createTempDirectory("graft_scm").toString
    val ckpt = Files.createTempDirectory("graft_scm_ckpt").toString
    val mon = new StreamingCountMin(root, "item", d = 3, w = 64)

    val mem = MemoryStream[String](spark)
    val stream = mem.toDF().toDF("item")

    mem.addData(batch1: _*)
    val q1 = mon.writer(stream, ckpt).start()
    q1.processAllAvailable(); q1.stop()

    mem.addData(batch2: _*)
    val q2 = mon.writer(stream, ckpt).start()
    q2.processAllAvailable(); q2.stop()

    val all = (batch1 ++ batch2).toDF("item")
    assert(canon(mon.sketch(spark).get) ==
      canon(CountMin.build(all, "item", d = 3, w = 64)))
    // Point estimates over all history: one-sided guarantee + exactness
    // on this tiny universe (no forced collisions at w=64, but est >= true
    // must hold unconditionally).
    val est = mon.estimates(spark, all, "item").get
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val truth = Map("a" -> 4L, "b" -> 2L, "c" -> 1L, "d" -> 2L)
    truth.foreach { case (k, t) => assert(est(k) >= t, s"$k: ${est(k)} < $t") }
    assert(est.values.sum >= truth.values.sum)
  }

  test("replayed batch id is a no-op; a fresh id DOES add (sum semantics)") {
    val root = Files.createTempDirectory("graft_scm2").toString
    val mon = new StreamingCountMin(root, "item", d = 3, w = 64)
    val b = batch1.toDF("item")
    mon.mergeBatch(b, 0L)
    val once = canon(mon.sketch(spark).get)
    mon.mergeBatch(b, 0L) // replay: batch-id log guards the non-idempotent sum
    assert(canon(mon.sketch(spark).get) == once)
    mon.mergeBatch(b, 1L) // out-of-band re-add under a fresh id: counts double
    val est = mon.estimates(spark, Seq("a").toDF("item"), "item").get
      .head.getLong(1)
    assert(est >= 6L, s"expected doubled count for 'a', got $est")
  }

  test("state stays bounded at d*w cells regardless of volume") {
    val root = Files.createTempDirectory("graft_scm3").toString
    val mon = new StreamingCountMin(root, "item", d = 2, w = 16)
    mon.mergeBatch((0 until 500).map(i => s"item$i").toDF("item"), 0L)
    mon.mergeBatch((0 until 500).map(i => s"other$i").toDF("item"), 1L)
    assert(mon.sketch(spark).get.count() <= 2L * 16)
  }
}
