package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import graft.ops.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

class StreamingNearDedupSpec extends AnyFunSuite with SparkTestBase {

  private def t(s: String) = Timestamp.valueOf(s)

  private val base = "the quick brown fox jumps over the lazy dog while " +
    "seventeen startled geese assemble near the frozen river bank at dawn " +
    "watching every careless step with growing suspicion and mild disdain"
  private val nearDup = base.replace("growing", "mounting")
  private val unrelated = "completely different subject matter entirely " +
    "concerning the quarterly financial performance of an obscure regional " +
    "railway operator and its perpetually delayed infrastructure upgrades"

  /** The batch-side estimate the streaming flag must reproduce: fraction
    * of agreeing MinHash positions under the same seeded family.
    */
  private def batchEst(a: String, b: String, numHashes: Int): Double = {
    import spark.implicits._
    val sigs = Seq((0L, a), (1L, b)).toDF("id", "text")
      .select(Dedup.minHashSignature(
        graft.expr.WordShingles.shingles(col("text"), 3, distinct = true),
        numHashes).as("sig"))
      .as[Seq[Long]].collect()
    sigs(0).zip(sigs(1)).count { case (x, y) => x == y }.toDouble / numHashes
  }

  test("near-dups flag against PRIOR batches; distinct docs pass; est matches batch family") {
    import spark.implicits._
    val mem = MemoryStream[(Long, String, Timestamp)](spark)
    val docs = mem.toDF().toDF("doc_id", "text", "ts")
    val q = StreamingNearDedup.flags(docs, "doc_id", "text", "ts",
      numHashes = 16, bands = 4, tau = 0.5, watermarkDelay = "0 seconds")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("neardup_out").start()

    mem.addData((1L, base, t("2024-01-01 10:00:00")),
      (2L, unrelated, t("2024-01-01 10:00:01")))
    q.processAllAvailable()
    // Nothing to collide with yet.
    assert(spark.table("neardup_out").count() == 0)

    mem.addData(
      (3L, base, t("2024-01-01 10:05:00")),      // exact dup of 1
      (4L, nearDup, t("2024-01-01 10:05:01")),   // near dup of 1
      (5L, "thoroughly novel prose describing migratory puffin colonies " +
        "along basalt cliffs where field biologists tally nesting burrows " +
        "each brief subarctic summer", t("2024-01-01 10:05:02")))
    q.processAllAvailable()
    q.stop()

    val flags = spark.table("neardup_out")
      .groupBy("doc_id").agg(min("dup_of").as("dup_of"), max("sim_est").as("est"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

    // Exact dup: every MinHash position agrees.
    assert(flags(3L) == (1L, 1.0))
    // Near dup: flagged against the first-seen original with the SAME
    // estimate the batch signature family yields (deterministic seeds).
    val wantEst = batchEst(base, nearDup, 16)
    assert(wantEst >= 0.5, s"fixture texts must clear tau, got $wantEst")
    assert(flags(4L)._1 == 1L && math.abs(flags(4L)._2 - wantEst) < 1e-12)
    // Distinct content never flags (5 shares no bucket signature-match).
    assert(!flags.contains(5L) && !flags.contains(2L))
  }

  test("event-time TTL evicts idle buckets: a dup after the horizon is a new original") {
    import spark.implicits._
    val mem = MemoryStream[(Long, String, Timestamp)](spark)
    val docs = mem.toDF().toDF("doc_id", "text", "ts")
    val q = StreamingNearDedup.flags(docs, "doc_id", "text", "ts",
      numHashes = 16, bands = 4, tau = 0.5, watermarkDelay = "0 seconds",
      stateTtlMs = 1000L)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("neardup_ttl_out").start()

    mem.addData((1L, base, t("2024-01-01 10:00:00")))
    q.processAllAvailable()
    // Push the watermark far past 10:00:00 + 1s with unrelated traffic,
    // then once more so the timed-out bucket is actually processed.
    mem.addData((2L, unrelated, t("2024-01-01 12:00:00")))
    q.processAllAvailable()
    mem.addData((3L, unrelated + " again", t("2024-01-01 12:00:01")))
    q.processAllAvailable()
    // Doc 1's buckets have been evicted: its exact duplicate is NOT
    // flagged — it re-enters as the new original for the fresh horizon.
    mem.addData((4L, base, t("2024-01-01 12:00:02")))
    q.processAllAvailable()
    // …and a further duplicate now flags against doc 4, proving the
    // bucket restarted rather than died.
    mem.addData((5L, base, t("2024-01-01 12:00:03")))
    q.processAllAvailable()
    q.stop()

    val flags = spark.table("neardup_ttl_out")
      .select("doc_id", "dup_of").distinct()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!flags.contains(4L), s"evicted bucket must not flag: $flags")
    assert(flags.get(5L).contains(4L), s"restarted bucket must flag 5->4: $flags")
  }

  test("redelivered ids are state no-ops: a retry storm cannot fill the " +
      "bucket cap with copies of one doc") {
    import spark.implicits._
    val mem = MemoryStream[(Long, String, Timestamp)](spark)
    val docs = mem.toDF().toDF("doc_id", "text", "ts")
    // Cap 2: with the old append-on-redelivery behavior two redeliveries
    // of doc 1 cap the bucket and doc 9's near-dup is never flagged.
    val q = StreamingNearDedup.flags(docs, "doc_id", "text", "ts",
      numHashes = 16, bands = 4, tau = 0.5, watermarkDelay = "0 seconds",
      maxPerBucket = 2)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("neardup_redeliver").start()
    mem.addData((1L, base, t("2024-01-01 10:00:00")))
    q.processAllAvailable()
    // At-least-once redeliveries of the SAME doc across later batches.
    mem.addData((1L, base, t("2024-01-01 10:00:00")))
    q.processAllAvailable()
    mem.addData((1L, base, t("2024-01-01 10:00:00")))
    q.processAllAvailable()
    // A genuine near-dup must still flag against the single stored entry.
    mem.addData((9L, nearDup, t("2024-01-01 10:05:00")))
    q.processAllAvailable()
    q.stop()
    val flags = spark.table("neardup_redeliver")
      .select("doc_id", "dup_of").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(flags.toSet == Set((9L, 1L)), flags.mkString(","))
  }

  test("capped buckets still flag dups but stop growing state") {
    import spark.implicits._
    val mem = MemoryStream[(Long, String, Timestamp)](spark)
    val docs = mem.toDF().toDF("doc_id", "text", "ts")
    val q = StreamingNearDedup.flags(docs, "doc_id", "text", "ts",
      numHashes = 16, bands = 4, tau = 0.5, watermarkDelay = "0 seconds",
      maxPerBucket = 1)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("neardup_cap_out").start()

    mem.addData((1L, base, t("2024-01-01 10:00:00")))
    q.processAllAvailable()
    mem.addData((2L, base, t("2024-01-01 10:00:01")),
      (3L, nearDup, t("2024-01-01 10:00:02")))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("neardup_cap_out")
      .groupBy("doc_id").agg(min("dup_of").as("dup_of"),
        max("bucket_capped").as("capped"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // Both later docs flag against the single stored original, and the
    // cap=1 bucket reports itself capped.
    assert(rows.toSet == Set((2L, 1L, true), (3L, 1L, true)))
  }
}
