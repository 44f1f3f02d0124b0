package graft.ingest

import java.sql.Timestamp
import java.time.{ZonedDateTime, ZoneOffset}

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class IncrementalIngestSpec extends AnyFunSuite with SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)
  private val now = ZonedDateTime.of(2024, 2, 1, 12, 0, 0, 0, ZoneOffset.UTC)

  test("fetch range: watermark minus overlap, cold start lookback") {
    import spark.implicits._
    val existing = Seq((1L, ts("2024-01-31 10:00:00"), "a"))
      .toDF("id", "timestamp", "raw_content")
    val (start, end) = IncrementalIngest.resolveFetchRange(Some(existing), now)
    assert(start == ts("2024-01-31 09:50:00")) // max - 10 min
    assert(end == ts("2024-02-01 11:59:00")) // now - 1 min

    val (coldStart, _) = IncrementalIngest.resolveFetchRange(None, now)
    assert(coldStart == ts("2023-11-03 12:00:00")) // now - 90 days
  }

  test("idempotent append: re-running with overlap adds nothing new") {
    import spark.implicits._
    val existing = Seq((1L, "a"), (2L, "b")).toDF("id", "raw_content")
    val incoming = Seq((2L, "b"), (2L, "b"), (3L, "c")).toDF("id", "raw_content")
    val toAppend = IncrementalIngest.rowsToAppend(existing, incoming, Seq("id", "raw_content"))
    assert(toAppend.collect().map(_.getLong(0)).toSeq == Seq(3L))
    // idempotency: appending then re-running the same incoming adds nothing
    val after = existing.unionByName(toAppend)
    assert(IncrementalIngest.rowsToAppend(after, incoming, Seq("id", "raw_content")).count() == 0)
  }

  test("mode-new scope: watermark rows plus dead-letter retries, deduped") {
    import spark.implicits._
    val raw = (1L to 10L).map(i => (i, s"m$i")).toDF("id", "raw_content")
    val dead = Seq(2L, 9L).toDF("raw_log_id") // 9 also above watermark
    val scope = IncrementalIngest.rowsToParse(raw, Some(8L), dead)
      .collect().map(_.getLong(0)).toSet
    assert(scope == Set(2L, 9L, 10L))
  }

  test("dead-letter cleanup drops parsed ids") {
    import spark.implicits._
    val dead = Seq((2L, "x"), (5L, "y")).toDF("raw_log_id", "raw_content")
    val parsed = Seq(5L).toDF("raw_log_id")
    val left = IncrementalIngest.cleanDeadLetter(dead, parsed)
      .collect().map(_.getLong(0)).toSeq
    assert(left == Seq(2L))
  }

  test("parse mode all ≡ repeated mode new (idempotent-incremental contract)") {
    import spark.implicits._
    val msgs = Seq(
      (1L, ts("2024-01-01 00:00:00"), "Hans received a rare drop: Whip"),
      (2L, ts("2024-01-01 01:00:00"), "junk line"),
      (3L, ts("2024-01-01 02:00:00"), "Bob received a rare drop: Bow"))
    val raw = msgs.toDF("id", "timestamp", "raw_content")
    val all = graft.parse.ParseEngine.parse(raw)

    // Incremental: first wave ids 1-2, second wave id 3 + retry of 2.
    val wave1 = graft.parse.ParseEngine.parse(raw.filter($"id" <= 2))
    val wm = IncrementalIngest.parsedWatermark(wave1.chat, wave1.broadcasts)
    val scope2 = IncrementalIngest.rowsToParse(raw, wm, wave1.unparsed)
    val wave2 = graft.parse.ParseEngine.parse(scope2)
    val combined = wave1.broadcasts.unionByName(wave2.broadcasts)
      .select("raw_log_id").collect().map(_.getLong(0)).toSet
    assert(combined == all.broadcasts.select("raw_log_id").collect().map(_.getLong(0)).toSet)
    // the junk line is still dead after both waves
    assert(wave2.unparsed.collect().map(_.getLong(0)).toSet == Set(2L))
  }
}
