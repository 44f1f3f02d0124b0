package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Exactly-once keyed merge sink: at-least-once micro-batches in, one
  * last-write-wins row per key out, replays no-ops, readers never see a
  * partial snapshot.
  */
class StreamingGoldSpec extends AnyFunSuite with SparkTestBase {

  private def state(g: StreamingGold): Map[Long, (String, Long)] = {
    import spark.implicits._
    g.read(spark).get.select("k", "v", "ver").as[(Long, String, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
  }

  test("streamed micro-batches merge to last-write-wins per key") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_sgold").toString
    val ckpt = Files.createTempDirectory("graft_sgold_ckpt").toString
    val gold = new StreamingGold(root, keys = Seq("k"), versionCol = "ver")

    val mem = MemoryStream[(Long, String, Long)](spark)
    val stream = mem.toDF().toDF("k", "v", "ver")

    mem.addData((1L, "a0", 0L), (2L, "b0", 0L))
    val q1 = gold.writer(stream, ckpt).start()
    q1.processAllAvailable(); q1.stop()
    assert(state(gold) == Map(1L -> ("a0", 0L), 2L -> ("b0", 0L)))

    // Second run over the SAME checkpoint: only new data arrives, the
    // upsert overwrites key 1 and inserts key 3.
    mem.addData((1L, "a1", 5L), (3L, "c0", 1L))
    val q2 = gold.writer(stream, ckpt).start()
    q2.processAllAvailable(); q2.stop()
    assert(state(gold) ==
      Map(1L -> ("a1", 5L), 2L -> ("b0", 0L), 3L -> ("c0", 1L)))
  }

  test("replayed batch ids are no-ops; stale versions lose the merge") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_sgold2").toString
    val gold = new StreamingGold(root, keys = Seq("k"), versionCol = "ver")

    gold.mergeBatch(Seq((1L, "new", 10L)).toDF("k", "v", "ver"), batchId = 0L)
    assert(gold.committedBatchId == 0L)
    // Replay of batch 0 with DIFFERENT (corrupted) content: ignored.
    gold.mergeBatch(Seq((1L, "corrupt", 99L)).toDF("k", "v", "ver"), 0L)
    assert(state(gold) == Map(1L -> ("new", 10L)))
    // A later batch carrying an OLDER version for key 1 loses to the
    // current row (merge is by version, not arrival order).
    gold.mergeBatch(Seq((1L, "old", 3L), (2L, "x", 1L)).toDF("k", "v", "ver"), 1L)
    assert(state(gold) == Map(1L -> ("new", 10L), 2L -> ("x", 1L)))
    // Same-version ties resolve deterministically (lexicographic max on
    // the payload struct), not by arrival order.
    gold.mergeBatch(Seq((1L, "aaa", 10L)).toDF("k", "v", "ver"), 2L)
    assert(state(gold)(1L) == ("new", 10L)) // "new" > "aaa"
  }

  test("vacuum removes only the stale slot; pointer survives crash-like state") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_sgold3").toString
    val gold = new StreamingGold(root, Seq("k"), "ver")
    gold.mergeBatch(Seq((1L, "a", 1L)).toDF("k", "v", "ver"), 0L)
    gold.mergeBatch(Seq((2L, "b", 1L)).toDF("k", "v", "ver"), 1L)
    // Two slots exist now; live is gold_a (swapped twice).
    gold.vacuum()
    assert(state(gold) == Map(1L -> ("a", 1L), 2L -> ("b", 1L)))
    // The merged state must be re-publishable after vacuum.
    gold.mergeBatch(Seq((3L, "c", 1L)).toDF("k", "v", "ver"), 2L)
    assert(state(gold).keySet == Set(1L, 2L, 3L))
  }
}
