package graft.gold

import java.nio.file.Files
import java.time.{Duration, Instant}
import java.util.concurrent.atomic.AtomicInteger

import graft.{OsrsPipeline, SparkTestBase}
import org.scalatest.funsuite.AnyFunSuite

class StageGateSpec extends AnyFunSuite with SparkTestBase {

  private val t0 = Instant.parse("2024-01-01T00:00:00Z")
  private val day = Duration.ofHours(24)

  private def tempState() =
    Files.createTempDirectory("stage-gate").resolve("ETL_state.tsv")

  test("second run within the interval skips; after it, runs again") {
    val state = tempState()
    val calls = new AtomicInteger(0)
    def attempt(now: Instant) =
      StageGate.runGated(state, "price_fetcher", day, now)(calls.incrementAndGet())

    assert(attempt(t0) == StageGate.Ran(1))
    assert(attempt(t0.plus(Duration.ofHours(23))) == StageGate.Skipped)
    assert(calls.get() == 1)
    assert(attempt(t0.plus(Duration.ofHours(24))) == StageGate.Ran(2))
  }

  test("tolerated failure: captured, state not advanced, next run retries") {
    val state = tempState()
    var fail = true
    def attempt(now: Instant) =
      StageGate.runGated(state, "price_fetcher", day, now, tolerateFailure = true) {
        if (fail) sys.error("api down") else 42
      }

    assert(attempt(t0).isInstanceOf[StageGate.Failed])
    // Failure did not advance the gate: an immediate retry still runs.
    fail = false
    assert(attempt(t0.plus(Duration.ofMinutes(1))) == StageGate.Ran(42))
    assert(attempt(t0.plus(Duration.ofMinutes(2))) == StageGate.Skipped)
  }

  test("untolerated failure propagates; other stages' entries survive") {
    val state = tempState()
    StageGate.recordSuccess(state, "other_stage", t0)
    intercept[RuntimeException] {
      StageGate.runGated(state, "parse", day, t0)(sys.error("boom"))
    }
    StageGate.recordSuccess(state, "parse", t0.plus(Duration.ofHours(1)))
    val st = StageGate.readState(state)
    assert(st("other_stage") == t0)
    assert(st("parse") == t0.plus(Duration.ofHours(1)))
  }

  test("corrupt state file means run everything") {
    val state = tempState()
    Files.createDirectories(state.getParent)
    Files.write(state, "not\ta-valid-instant".getBytes)
    assert(StageGate.shouldRun(state, "price_fetcher", day, t0))
  }

  test("log retention: old dated files pruned, recent/undated/bad-date kept") {
    val dir = Files.createTempDirectory("graft_logs")
    val now = Instant.parse("2024-06-15T12:00:00Z")
    Seq(
      "run_all_etl_2024-05-01.log",       // 45 days old → delete
      "summary_2024-06-10_120000.txt",    // 5 days old → keep
      "etl_2024-06-01.log",               // midnight of cutoff DAY < 12:00 cutoff → delete (reference semantics)
      "no_date_in_name.log",              // no date → keep
      "weird_2024-13-45.log",             // unparsable date → keep
      "old_summary_2023-12-31.json"       // very old → delete
    ).foreach(n => Files.write(dir.resolve(n), "x".getBytes))
    // Subdirectory with an old-looking name must never be touched.
    val sub = Files.createDirectory(dir.resolve("archive_2020-01-01"))

    val deleted = StageGate.cleanupOldFiles(dir, retentionDays = 14, now = now)
    assert(deleted.toSet === Set("run_all_etl_2024-05-01.log",
      "etl_2024-06-01.log", "old_summary_2023-12-31.json"))
    val remaining = {
      val s = Files.list(dir)
      try {
        val b = Seq.newBuilder[String]
        s.iterator().forEachRemaining(p => b += p.getFileName.toString)
        b.result()
      } finally s.close()
    }
    assert(remaining.toSet === Set("summary_2024-06-10_120000.txt",
      "no_date_in_name.log", "weird_2024-13-45.log", "archive_2020-01-01"))
    assert(Files.isDirectory(sub))
    // Missing directory: no-op, empty result.
    assert(StageGate.cleanupOldFiles(dir.resolve("nope"), 14, now).isEmpty)
  }

  test("pipeline integration: failed price fetch doesn't fail the pipeline") {
    import spark.implicits._
    val state = tempState()
    // Price stage blows up → None → OsrsPipeline.run on constant overrides.
    val prices = OsrsPipeline.gatedItemPrices(state, t0)(sys.error("api down"))
    assert(prices.isEmpty)
    val raw = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"),
      "alpha received a drop: Abyssal whip (1,500,000 coins) from Vorkath."))
      .toDF("id", "timestamp", "raw_content")
    val gold = OsrsPipeline.run(raw,
      java.time.ZonedDateTime.of(2024, 1, 2, 0, 0, 0, 0, java.time.ZoneOffset.UTC),
      itemPrices = prices.orElse(None))
    assert(gold("valuable_drops_summary").count() == 1)

    // A successful fetch advances the gate; the next run skips the stage.
    val ok = OsrsPipeline.gatedItemPrices(state, t0.plus(Duration.ofMinutes(5)))(
      Seq(("2", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 100L))
        .toDF("item_id", "timestamp", "avg_high_price"))
    assert(ok.nonEmpty)
    val skipped = OsrsPipeline.gatedItemPrices(state, t0.plus(Duration.ofHours(6)))(
      sys.error("should not be called"))
    assert(skipped.isEmpty)
  }
}
