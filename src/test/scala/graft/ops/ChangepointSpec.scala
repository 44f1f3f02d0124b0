package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-shift tests for TimeSeries.changePoints and planted-trend
  * tests for TimeSeries.theilSen.
  */
class ChangepointSpec extends AnyFunSuite with SparkTestBase {

  private def series(rows: (String, Long, Long)*) = {
    import spark.implicits._
    rows.toDF("k", "t", "y")
  }

  test("single planted mean shift is found at the boundary") {
    // 10 at t=1..10, then 50 at t=11..20: best split after t=10.
    val df = series((1L to 20L).map(t =>
      ("a", t, if (t <= 10) 10L else 50L)): _*)
    val cps = TimeSeries.changePoints(df, "k", "t", "y", depth = 1)
      .collect()
    assert(cps.length == 1)
    assert(cps.head.getAs[Long]("t") == 10L)
  }

  test("flat series yields no change point") {
    val df = series((1L to 12L).map(t => ("flat", t, 7L)): _*)
    assert(TimeSeries.changePoints(df, "k", "t", "y", depth = 2).isEmpty)
  }

  test("depth 2 finds a second shift inside a child segment") {
    // Three levels: 10 (t≤8), 50 (9..16), 100 (17..24). Depth 1 splits
    // somewhere between the regimes; depth 2 must surface the other
    // boundary from within a child.
    val df = series((1L to 24L).map { t =>
      ("a", t, if (t <= 8) 10L else if (t <= 16) 50L else 100L)
    }: _*)
    val cps = TimeSeries.changePoints(df, "k", "t", "y", depth = 2)
      .collect().map(r => (r.getAs[Int]("depth"), r.getAs[Long]("t"))).toSet
    val found = cps.map(_._2)
    assert(found.contains(8L) && found.contains(16L),
      s"expected both regime boundaries, got $cps")
  }

  test("minSeg forbids splits that strand a short child") {
    // Shift after t=1 — with minSeg=3 the split at t=1 is out of range,
    // so the best IN-RANGE point is chosen instead.
    val df = series((1L to 10L).map(t =>
      ("a", t, if (t <= 1) 100L else 10L)): _*)
    val cps = TimeSeries.changePoints(df, "k", "t", "y",
      depth = 1, minSeg = 3).collect()
    assert(cps.forall { r =>
      val t = r.getAs[Long]("t"); t >= 3L && t <= 7L
    })
  }

  test("series are independent: per-key splits") {
    val df = series(
      ((1L to 12L).map(t => ("a", t, if (t <= 6) 0L else 90L)) ++
        (1L to 12L).map(t => ("b", t, if (t <= 3) 90L else 0L))): _*)
    val byKey = TimeSeries.changePoints(df, "k", "t", "y", depth = 1)
      .collect().map(r => r.getAs[String]("k") -> r.getAs[Long]("t")).toMap
    assert(byKey("a") == 6L && byKey("b") == 3L)
  }

  test("theil-sen recovers a clean linear trend exactly") {
    // y = 3t + 2: every pairwise slope is exactly 3, every intercept 2.
    val df = series((1L to 9L).map(t => ("lin", t, 3 * t + 2)): _*)
    val r = TimeSeries.theilSen(df, "k", "t", "y").collect().head
    assert(r.getAs[Double]("slope") == 3.0)
    assert(r.getAs[Double]("intercept") == 2.0)
    assert(r.getAs[Long]("n") == 9L)
  }

  test("theil-sen shrugs off an outlier that drags OLS") {
    // y = 2t with one wild point AT THE END — a high-leverage outlier (a
    // centered one wouldn't move the OLS slope); the pairwise-slope
    // median stays 2.
    val clean = (1L to 11L).map(t => ("r", t, 2 * t))
    val df = series((clean.filterNot(_._2 == 11L) :+ (("r", 11L, 1000L))): _*)
    val r = TimeSeries.theilSen(df, "k", "t", "y").collect().head
    assert(math.abs(r.getAs[Double]("slope") - 2.0) < 0.2,
      s"slope ${r.getAs[Double]("slope")} not robust")
    // OLS on the same data is pulled far off 2.
    val ols = Regression.groupTrend(
      df.select(col("k"), col("t").as("day"), col("y").cast("double").as("v")),
      Seq("k"), "day", "v").collect().head
    assert(math.abs(ols.getAs[Double]("slope") - 2.0) > 5.0)
  }
}
