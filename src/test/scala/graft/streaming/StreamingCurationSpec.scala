package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import scala.collection.mutable

import graft.SparkTestBase
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The composed curation chain (exact dedup → near-dup → quality → as-of
  * enrich) under ONE foreachBatch with checkpoint-stop-resume: no kept
  * doc lost, no doc emitted twice, duplicates and junk dropped, prices
  * correct — across a query restart and across a crash between sink and
  * corpus commit.
  */
class StreamingCurationSpec extends AnyFunSuite with SparkTestBase {

  private def t(s: String) = Timestamp.valueOf(s)

  private val base = "the quick brown fox jumps over the lazy dog while " +
    "seventeen startled geese assemble near the frozen river bank at dawn " +
    "watching every careless step with growing suspicion and mild disdain"
  private val nearDupA = base.replace("growing", "mounting")
  private val nearDupB = base.replace("mild", "plain")
  private val unrelated = "completely different subject matter entirely " +
    "concerning the quarterly financial performance of an obscure regional " +
    "railway operator and its perpetually delayed infrastructure upgrades"
  private val fresh = "the field biologists tally nesting burrows of " +
    "migratory puffin colonies along basalt cliffs each brief subarctic " +
    "summer and compare their counts against the previous decade of records"
  private val junk = "BUY NOW!!!"

  // 16 MinHash positions put ±1/16 granularity on the estimate: the
  // planted near-dups land at 0.8125 and 0.4375 under the md5 family, so
  // the gate sits at 0.4 (guarded below; unrelated texts share no band
  // bucket at all).
  private val tau = 0.4

  private def build(spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    Seq(("u1", t("2024-01-01 09:00:00"), 100L),
      ("u1", t("2024-01-01 10:05:00"), 150L),
      ("u2", t("2024-01-01 09:30:00"), 200L))
      .toDF("user", "price_ts", "price")
  }

  private def curationOn(dir: String) = new StreamingCuration(
    dir, idCol = "doc_id", textCol = "text", tsCol = "ts",
    minQuality = 0.7, tau = tau)

  test("fixture guard: near-dups clear tau under the md5 family; junk fails quality") {
    import spark.implicits._
    val pairs = graft.ops.Dedup.md5MinHashCandidatesAgainst(
      Seq((10L, nearDupA), (11L, nearDupB)).toDF("doc_id", "text"),
      Seq((1L, base)).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(pairs.get(10L).exists(_ >= tau), pairs.toString)
    assert(pairs.get(11L).exists(_ >= tau), pairs.toString)
    // Distinct texts never become candidates of base (no shared bucket).
    val distinctPairs = graft.ops.Dedup.md5MinHashCandidatesAgainst(
      Seq((20L, fresh), (21L, unrelated)).toDF("doc_id", "text"),
      Seq((1L, base)).toDF("doc_id", "text"), "doc_id", "text")
      .filter(col("jaccard_est") >= tau).count()
    assert(distinctPairs == 0L)
    val q = Seq((1L, base), (2L, junk), (3L, fresh), (4L, unrelated))
      .toDF("doc_id", "text")
      .select(col("doc_id"), graft.text.TextFunctions.qualityScore(
        col("text"), Seq("the", "a", "and", "of", "to")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(q(1L) >= 0.7 && q(3L) >= 0.7 && q(4L) >= 0.7, q.toString)
    assert(q(2L) < 0.7, q.toString)
  }

  test("end-to-end with restart: no loss, no dup, junk and dups dropped, prices right") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_cur").toString
    val ckpt = Files.createTempDirectory("graft_cur_ckpt").toString
    val cur = curationOn(root)
    val emitted = mutable.Map.empty[Long, Array[Row]]
    val sink = (df: DataFrame, id: Long) => {
      emitted.synchronized { emitted(id) = df.collect() }; ()
    }

    val mem = MemoryStream[(Long, String, String, Timestamp)](spark)
    val docs = mem.toDF().toDF("doc_id", "user", "text", "ts")
    def start() = cur.writer(docs, build, Seq("user"), "price_ts",
      Seq("price"))(sink)
      .option("checkpointLocation", ckpt).start()

    // Batch A: keeper, junk (quality), keeper, exact dup of 1 (later ts),
    // within-batch near-dup of 1 (later ts).
    mem.addData(
      (1L, "u1", base, t("2024-01-01 10:00:00")),
      (2L, "u1", junk, t("2024-01-01 10:00:01")),
      (3L, "u2", unrelated, t("2024-01-01 10:00:02")),
      (4L, "u2", base, t("2024-01-01 10:00:03")),
      (9L, "u1", nearDupB, t("2024-01-01 10:00:05")))
    val q1 = start()
    q1.processAllAvailable(); q1.stop()

    // RESTART on the same checkpoint; batch B: cross-batch near-dup of 1,
    // a genuinely new keeper, a cross-batch exact dup of 3.
    mem.addData(
      (5L, "u1", nearDupA, t("2024-01-01 10:10:00")),
      (6L, "u1", fresh, t("2024-01-01 10:10:05")),
      (7L, "u2", unrelated, t("2024-01-01 10:10:06")))
    val q2 = start()
    q2.processAllAvailable(); q2.stop()

    val all = emitted.synchronized {
      emitted.values.flatten.map(r =>
        r.getLong(r.fieldIndex("doc_id")) ->
          r.get(r.fieldIndex("price"))).toSeq
    }
    // Exactly-once per kept doc — no loss (1, 3, 6 present), no dup
    // (each once), everything else dropped by its stage.
    assert(all.map(_._1).sorted == Seq(1L, 3L, 6L), all.toString)
    val prices = all.toMap
    assert(prices(1L) == 100L) // u1 backward from 10:00 -> 09:00 quote
    assert(prices(3L) == 200L) // u2 backward -> 09:30 quote
    assert(prices(6L) == 150L) // u1 at 10:10 -> 10:05 quote
    // The kept corpus holds exactly the survivors.
    val corpusIds = cur.corpus(spark).get.select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(corpusIds == Set(1L, 3L, 6L))
  }

  test("crash between sink and commit: retry recomputes identical output, then replays no-op") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_cur_crash").toString
    val cur = curationOn(root)
    val batch = Seq(
      (1L, "u1", base, t("2024-01-01 10:00:00")),
      (3L, "u2", unrelated, t("2024-01-01 10:00:02")))
      .toDF("doc_id", "user", "text", "ts")

    // Attempt 1: the sink materializes its rows, then "crashes" before
    // the corpus commit.
    var firstRows: Array[Row] = Array.empty
    val boom = intercept[RuntimeException] {
      cur.processBatch(batch, 0L, build(spark), Seq("user"), "price_ts",
        Seq("price")) { (df, _) => firstRows = df.collect()
          throw new RuntimeException("crash after sink, before commit") }
    }
    assert(boom.getMessage.contains("before commit"))
    assert(cur.committedBatchId == -1L, "crash must not have committed")

    // Retry of the SAME batchId: corpus unchanged, so the recompute is
    // identical; commit lands this time.
    var retryRows: Array[Row] = Array.empty
    cur.processBatch(batch, 0L, build(spark), Seq("user"), "price_ts",
      Seq("price")) { (df, _) => retryRows = df.collect() }
    assert(retryRows.map(_.toSeq).toSet == firstRows.map(_.toSeq).toSet)
    assert(retryRows.nonEmpty && cur.committedBatchId == 0L)

    // Replay of a committed batchId: complete no-op, sink never invoked.
    var called = false
    cur.processBatch(batch, 0L, build(spark), Seq("user"), "price_ts",
      Seq("price")) { (_, _) => called = true }
    assert(!called && cur.committedBatchId == 0L)
  }

  test("empty micro-batches flow through with gap-free ids and commit") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_cur_empty").toString
    val cur = curationOn(root)
    val schema = Seq((1L, "u1", base, t("2024-01-01 10:00:00")))
      .toDF("doc_id", "user", "text", "ts")
    val ids = mutable.ArrayBuffer.empty[Long]
    cur.processBatch(schema, 0L, build(spark), Seq("user"), "price_ts",
      Seq("price")) { (_, id) => ids += id }
    cur.processBatch(schema.filter(lit(false)), 1L, build(spark),
      Seq("user"), "price_ts", Seq("price")) { (df, id) =>
        ids += id; assert(df.count() == 0) }
    assert(ids.toSeq == Seq(0L, 1L) && cur.committedBatchId == 1L)
  }

  test("CDC: same-batch delete + add of one id is an UPDATE — the old " +
    "content leaves the corpus, the new content lands, and the sink " +
    "delivery carries both rows") {
    import spark.implicits._
    val cur = curationOn(
      java.nio.file.Files.createTempDirectory("cur_cdc").toString)
    // Batch 0 seeds the corpus with 1 (base) and 2 (unrelated).
    cur.processBatch(Seq(
        (1L, "u1", base, t("2024-01-01 10:00:00"), "add"),
        (2L, "u2", unrelated, t("2024-01-01 10:00:02"), "add"))
        .toDF("doc_id", "user", "text", "ts", "op"),
      0L, build(spark), Seq("user"), "price_ts", Seq("price"),
      opCol = Some("op"))((_, _) => ())
    assert(cur.committedBatchId == 0L)
    // Batch 1: UPDATE doc 1 (delete + add with new text, one batch).
    var delivered: Array[Row] = Array.empty
    cur.processBatch(Seq(
        (1L, "u1", "", t("2024-01-01 10:10:00"), "delete"),
        (1L, "u1", fresh, t("2024-01-01 10:10:01"), "add"))
        .toDF("doc_id", "user", "text", "ts", "op"),
      1L, build(spark), Seq("user"), "price_ts", Seq("price"),
      opCol = Some("op"))((df, _) => delivered = df.collect())
    assert(cur.committedBatchId == 1L)
    // The delivery carries BOTH rows — the downstream index writers
    // sequence their own family's recipe from exactly this frame.
    val ops = delivered.map(r =>
      (r.getLong(r.fieldIndex("doc_id")), r.getString(r.fieldIndex("op"))))
      .toSet
    assert(ops == Set((1L, "delete"), (1L, "add")), ops.toString)
    // Corpus: doc 1 now holds the NEW text (old digest gone, so the new
    // content neither exact- nor near-dup-blocked by the dead row).
    val texts = cur.corpus(spark).get.select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(texts.keySet == Set(1L, 2L))
    assert(texts(1L) == fresh)
    // A no-op update (identical content) round-trips too: the dead
    // row's digest must not block its own re-add.
    cur.processBatch(Seq(
        (1L, "u1", "", t("2024-01-01 10:20:00"), "delete"),
        (1L, "u1", fresh, t("2024-01-01 10:20:01"), "add"))
        .toDF("doc_id", "user", "text", "ts", "op"),
      2L, build(spark), Seq("user"), "price_ts", Seq("price"),
      opCol = Some("op"))((_, _) => ())
    assert(cur.corpus(spark).get.filter(col("doc_id") === 1L).count() == 1L)
  }

  test("CDC: rows whose op is NULL or outside {'add','delete'} fail " +
    "the batch loudly instead of silently vanishing in the split") {
    import spark.implicits._
    val cur = curationOn(
      java.nio.file.Files.createTempDirectory("cur_cdc_bad").toString)
    var sank = 0
    def attempt(op: Option[String]): IllegalArgumentException =
      intercept[IllegalArgumentException] {
        cur.processBatch(Seq(
            (1L, "u1", base, t("2024-01-01 10:00:00"), "add"),
            (2L, "u2", unrelated, t("2024-01-01 10:00:01"), op.orNull))
            .toDF("doc_id", "user", "text", "ts", "op"),
          0L, build(spark), Seq("user"), "price_ts", Seq("price"),
          opCol = Some("op"))((_, _) => sank += 1)
      }
    assert(attempt(None).getMessage.contains("outside {'add','delete'}"))
    assert(attempt(Some("upsert")).getMessage.contains("2->upsert"))
    assert(sank == 0, "sink must not fire on a failed batch")
    assert(cur.committedBatchId == -1L, "failed batch must not commit")
  }
}
