package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The streaming ingest path driven synchronously over a MemoryStream:
  * at-least-once delivery (duplicates inside the watermark) must yield
  * exactly the batch parse of the distinct messages — the reference's
  * overlap-and-UNIQUE contract (SURVEY.md §2.7 T3).
  */
class StreamingIngestSpec extends AnyFunSuite with SparkTestBase {

  test("watermark dedup + shared parse tree: stream result == batch result") {
    import spark.implicits._

    val mem = MemoryStream[(Long, Timestamp, String)](spark)
    val rawStream = mem.toDF().toDF("id", "timestamp", "raw_content")

    val out = Files.createTempDirectory("graft_stream_out").toString
    val ckpt = Files.createTempDirectory("graft_stream_ckpt").toString

    val writer = StreamingIngest.silverWriter(
      StreamingIngest.broadcastStream(rawStream), out, ckpt)

    def t(s: String) = Timestamp.valueOf(s)
    val msgs = Seq(
      (1L, t("2024-01-01 10:00:00"), "Hans received a rare drop: Whip"),
      (2L, t("2024-01-01 10:01:00"), "Bob received a rare drop: Bow"),
      // duplicate delivery of id 1's message (same timestamp+content)
      (3L, t("2024-01-01 10:00:00"), "Hans received a rare drop: Whip"),
      (4L, t("2024-01-01 10:02:00"), "chatter that parses nowhere"))
    mem.addData(msgs: _*)
    val q = writer.start()
    q.processAllAvailable()
    q.stop()

    val got = spark.read.parquet(out)
      .select("Username", "Item_Name").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("Hans", "Whip"), ("Bob", "Bow")))
  }

  test("dropDuplicatesWithinWatermark dedups redeliveries with re-stamped timestamps") {
    import spark.implicits._
    val mem = MemoryStream[(Long, Timestamp, String)](spark)
    val rawStream = mem.toDF().toDF("id", "timestamp", "raw_content")

    val out = Files.createTempDirectory("graft_dedup_out").toString
    val ckpt = Files.createTempDirectory("graft_dedup_ckpt").toString

    def t(s: String) = Timestamp.valueOf(s)
    mem.addData(
      (1L, t("2024-01-01 10:00:00"), "msg A"),
      // redelivery of id 1, re-stamped 30s later: (ts, content) dedup
      // would MISS this; the id-keyed within-watermark dedup must not
      (1L, t("2024-01-01 10:00:30"), "msg A"),
      (2L, t("2024-01-01 10:01:00"), "msg B"))
    val q = StreamingIngest.dedupedRawById(rawStream, Seq("id"))
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable()
    q.stop()

    val got = spark.read.parquet(out).select("id").collect().map(_.getLong(0)).toSeq
    assert(got.sorted == Seq(1L, 2L))
  }

  test("streaming content dedup keeps one doc per normalized digest") {
    import spark.implicits._
    val mem = MemoryStream[(Long, Timestamp, String)](spark)
    val docs = mem.toDF().toDF("doc_id", "ts", "text")

    val out = Files.createTempDirectory("graft_cdedup_out").toString
    val ckpt = Files.createTempDirectory("graft_cdedup_ckpt").toString

    def t(s: String) = Timestamp.valueOf(s)
    mem.addData(
      (1L, t("2024-01-01 10:00:00"), "Hello  World"),
      (2L, t("2024-01-01 10:00:10"), "hello world"), // same normalized content
      (3L, t("2024-01-01 10:00:20"), "something else entirely"))
    val q = StreamingIngest.streamingContentDedup(docs, "text", "ts")
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable()
    q.stop()

    val ids = spark.read.parquet(out).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.size == 2 && ids.contains(3L) && (ids.contains(1L) ^ ids.contains(2L)))
  }
}
