package graft.ops

import java.sql.Timestamp

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunnelSpec extends AnyFunSuite with SparkTestBase {

  private def t(s: String) = Timestamp.valueOf(s)

  private val stages = Seq(
    col("event_type") === "view",
    col("event_type") === "click",
    col("event_type") === "purchase")

  private def run(rows: Seq[(Long, Timestamp, Long, String)]) = {
    import spark.implicits._
    Funnel.steps(rows.toDF("user_id", "ts", "event_id", "event_type"),
      "user_id", "ts", Seq("event_id"), stages)
      .as[(Long, Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
  }

  test("order matters: stage events before their predecessor don't count") {
    val out = run(Seq(
      // user 1 completes in order
      (1L, t("2024-01-01 10:00:00"), 1L, "view"),
      (1L, t("2024-01-01 10:05:00"), 2L, "click"),
      (1L, t("2024-01-01 10:10:00"), 3L, "purchase"),
      // user 2: purchase BEFORE the view→click chain completes → 2 steps
      (2L, t("2024-01-01 09:00:00"), 4L, "purchase"),
      (2L, t("2024-01-01 09:10:00"), 5L, "view"),
      (2L, t("2024-01-01 09:20:00"), 6L, "click"),
      // user 3: click only, never viewed → 0 steps
      (3L, t("2024-01-01 08:00:00"), 7L, "click")))
    val us = (s: String) => t(s).getTime * 1000L
    assert(out(1L) == ((3L, Some(us("2024-01-01 10:00:00")),
      Some(us("2024-01-01 10:10:00")))))
    assert(out(2L) == ((2L, Some(us("2024-01-01 09:10:00")), None)))
    assert(out(3L) == ((0L, None, None)))
  }

  test("earliest qualifying event wins, not the earliest of the type") {
    val out = run(Seq(
      (1L, t("2024-01-01 10:00:00"), 1L, "click"),  // before any view
      (1L, t("2024-01-01 10:01:00"), 2L, "view"),
      (1L, t("2024-01-01 10:02:00"), 3L, "click"),  // the qualifying one
      (1L, t("2024-01-01 10:03:00"), 4L, "purchase")))
    val us = (s: String) => t(s).getTime * 1000L
    assert(out(1L) == ((3L, Some(us("2024-01-01 10:01:00")),
      Some(us("2024-01-01 10:03:00")))))
  }

  test("simultaneous timestamps resolve by the tie column (strictly after)") {
    // view and click share a timestamp; click has the LOWER event_id so it
    // sorts before the view → not qualified; the later click qualifies.
    val out = run(Seq(
      (1L, t("2024-01-01 10:00:00"), 2L, "view"),
      (1L, t("2024-01-01 10:00:00"), 1L, "click"),
      (1L, t("2024-01-01 10:05:00"), 3L, "click")))
    assert(out(1L)._1 == 2L)
    // Reversed ids: the simultaneous click follows the view in row order.
    val out2 = run(Seq(
      (1L, t("2024-01-01 10:00:00"), 1L, "view"),
      (1L, t("2024-01-01 10:00:00"), 2L, "click")))
    assert(out2(1L)._1 == 2L)
  }

  test("plan: one exchange, windows share it, no joins") {
    import spark.implicits._
    val df = Seq((1L, t("2024-01-01 10:00:00"), 1L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val plan = Funnel.steps(df, "user_id", "ts", Seq("event_id"), stages)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    val exchanges = plan.split('\n').count(_.contains("Exchange hashpartitioning"))
    // one for the window sort; the final agg reuses the user partitioning
    // or adds at most one more.
    assert(exchanges <= 2, plan)
  }
}
