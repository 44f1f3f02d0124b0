package graft.ops

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TransitionsAttributionSpec extends AnyFunSuite with SparkTestBase {

  private def ts(min: Long): Timestamp =
    new Timestamp(1704067200000L + min * 60000L) // 2024-01-01 + min

  private def ev(rows: (Long, Long, Long, String)*) = {
    import spark.implicits._
    rows.map { case (id, u, m, t) => (id, u, ts(m), t) }
      .toDF("event_id", "user_id", "ts", "event_type")
  }

  test("transition counts and probabilities from ordered per-user pairs") {
    val df = ev(
      (1L, 1L, 0L, "view"), (2L, 1L, 1L, "click"), (3L, 1L, 2L, "view"),
      (4L, 1L, 3L, "click"),
      (5L, 2L, 0L, "view"), (6L, 2L, 1L, "view"))
    val m = Transitions.matrix(df, "user_id", "ts", "event_type",
        tieCols = Seq("event_id"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // From view: 2x ->click, 1x ->view. From click: 1x ->view.
    assert(m(("view", "click")) === (2L, 0.6667))
    assert(m(("view", "view")) === (1L, 0.3333))
    assert(m(("click", "view")) === (1L, 1.0))
    // No cross-user pair: user 2's first event never follows user 1's last.
    assert(!m.contains(("click", "click")))
  }

  test("gap break: pairs across the quiet gap are not transitions") {
    val df = ev(
      (1L, 1L, 0L, "view"), (2L, 1L, 30L, "click"), // 30 min: within
      (3L, 1L, 200L, "purchase")) // 170 min after click: broken
    val m = Transitions.matrix(df, "user_id", "ts", "event_type",
        tieCols = Seq("event_id"), gapSeconds = Some(3600L))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(m === Map(("view", "click") -> 1L))
  }

  test("same-timestamp events order on the tie column") {
    val df = ev((2L, 1L, 0L, "b"), (1L, 1L, 0L, "a"))
    val m = Transitions.matrix(df, "user_id", "ts", "event_type",
        tieCols = Seq("event_id"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(m === Set(("a", "b")))
  }

  test("attribution: first/last touch within lookback, self excluded") {
    val df = ev(
      (1L, 1L, 0L, "view"), (2L, 1L, 10L, "click"), (3L, 1L, 20L, "view"),
      (4L, 1L, 30L, "purchase"),
      (5L, 2L, 0L, "purchase")) // no touches at all
    val rows = Attribution.touchAttribution(df, "user_id", "ts",
        "event_type", "event_id",
        isConversion = col("event_type") === "purchase",
        isTouch = col("event_type").isin("view", "click"),
        lookbackSeconds = 3600L)
      .collect().map(r => r.getAs[Long]("conv_id") ->
        ((r.getAs[String]("first_touch"), r.getAs[String]("last_touch"),
          r.getAs[Long]("n_touches")))).toMap
    assert(rows(4L) === (("view", "view", 3L)))
    assert(rows(5L) === (("none", "none", 0L)))
  }

  test("attribution lookback excludes stale touches; strict before excludes ties") {
    val df = ev(
      (1L, 1L, 0L, "click"),        // 100 min before conv: outside 1h window
      (2L, 1L, 70L, "view"),        // inside
      (3L, 1L, 100L, "click"),      // same ts as conversion: excluded (strict <)
      (4L, 1L, 100L, "purchase"))
    val r = Attribution.touchAttribution(df, "user_id", "ts",
        "event_type", "event_id",
        isConversion = col("event_type") === "purchase",
        isTouch = col("event_type").isin("view", "click"),
        lookbackSeconds = 3600L).collect().head
    assert(r.getAs[String]("first_touch") === "view")
    assert(r.getAs[String]("last_touch") === "view")
    assert(r.getAs[Long]("n_touches") === 1L)
  }

  test("report reconciles: n_conversions sums to the conversion count") {
    val df = ev(
      (1L, 1L, 0L, "view"), (2L, 1L, 5L, "purchase"),
      (3L, 2L, 0L, "click"), (4L, 2L, 5L, "purchase"),
      (5L, 3L, 0L, "purchase"))
    val rep = Attribution.report(df, "user_id", "ts", "event_type",
      "event_id", col("event_type") === "purchase",
      col("event_type").isin("view", "click"), 3600L)
    assert(rep.agg(sum("n_conversions")).head.getLong(0) === 3L)
    val byKey = rep.collect().map(r =>
      (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_conversions")).toMap
    assert(byKey(("none", "none")) === 1L)
  }
}
