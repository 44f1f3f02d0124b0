package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exercises [[TimeSeries.gapFreeCumulative]] at its design point: a
  * multi-year spine where the per-year partitioned running sums plus the
  * year-base-offset join must be bit-identical to a single global ordered
  * window (the scale-hostile form it replaces).
  */
class TimeSeriesSpec extends AnyFunSuite with SparkTestBase {

  test("per-year cumulative equals global-window cumulative over a 4-year daily spine") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    // 4 years of daily buckets (incl. a leap year), irregular values, with
    // zero-count gap rows exactly as resample's spine join produces them.
    val days = java.time.LocalDate.of(2020, 1, 1)
    val rows = (0 until 1461).map { i =>
      val d = days.plusDays(i.toLong)
      val cnt = if (rng.nextInt(5) == 0) 0L else rng.nextInt(100).toLong
      val v = BigDecimal(rng.nextInt(100000), 2)
      (java.sql.Date.valueOf(d), cnt, if (cnt == 0) BigDecimal(0, 2) else v)
    }
    val full = rows.toDF("Date", "Count", "Total_Value")
      .withColumn("Total_Value", col("Total_Value").cast("decimal(18,2)"))

    val sums = Seq("Count" -> "Cumulative_Count", "Total_Value" -> "Cumulative_Value")
    val fast = TimeSeries.gapFreeCumulative(full, "Date", sums)

    val wGlobal = Window.orderBy("Date")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val slow = sums.foldLeft(full) { case (df, (src, dst)) =>
      df.withColumn(dst, sum(col(src)).over(wGlobal))
    }

    val cols = Seq("Date", "Count", "Total_Value", "Cumulative_Count", "Cumulative_Value")
    val a = fast.select(cols.map(col): _*).orderBy("Date").collect()
    val b = slow.select(cols.map(col): _*).orderBy("Date").collect()
    assert(a.length == 1461)
    assert(a.toSeq == b.toSeq)
  }

  test("single-year input (no prior-year base) is unchanged") {
    import spark.implicits._
    val rows = (0 until 10).map(i =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2023, 1, 1).plusDays(i.toLong)), i.toLong))
    val df = rows.toDF("Date", "Count")
    val out = TimeSeries.gapFreeCumulative(df, "Date", Seq("Count" -> "Cum"))
      .orderBy("Date").select("Cum").as[Long].collect()
    assert(out.toSeq == Seq(0L, 1L, 3L, 6L, 10L, 15L, 21L, 28L, 36L, 45L))
  }

  test("ewmaFixedPoint: hand-stepped recurrence, per-series isolation") {
    import spark.implicits._
    val df = Seq(
      ("a", 3L, 8L), ("a", 1L, 16L), ("a", 2L, 0L), // out of order on purpose
      ("b", 1L, 8L)
    ).toDF("k", "t", "v")
    val got = TimeSeries.ewmaFixedPoint(df, "k", "t", "v", 1L, 8L, scale = 1000L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // a: r1=16000; r2=(0*1000 + 7*16000)/8=14000; r3=(8000+7*14000)/8=13250.
    assert(got == Set(("a", 1L, 16000L), ("a", 2L, 14000L), ("a", 3L, 13250L),
      ("b", 1L, 8000L)))
  }

  test("ewmaFixedPoint is partition-invariant") {
    import spark.implicits._
    val rows = (0 until 200).map(i => (s"k${i % 5}", i.toLong, (i * 37 % 100).toLong))
    val a = TimeSeries.ewmaFixedPoint(rows.toDF("k", "t", "v"), "k", "t", "v", 1L, 4L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(x => (x._1, x._2)).toSeq
    val b = TimeSeries.ewmaFixedPoint(rows.toDF("k", "t", "v").repartition(13), "k", "t", "v", 1L, 4L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sortBy(x => (x._1, x._2)).toSeq
    assert(a == b)
  }

  test("holtFixedPoint: hand-stepped level/trend/forecast, per-series") {
    import spark.implicits._
    val df = Seq(
      ("a", 2L, 0L), ("a", 1L, 16L), ("a", 3L, 8L), // out of order on purpose
      ("b", 1L, 5L)
    ).toDF("k", "t", "v")
    val got = TimeSeries.holtFixedPoint(df, "k", "t", "v",
        alphaNum = 1L, alphaDen = 4L, betaNum = 1L, betaDen = 5L,
        horizon = 2L, scale = 1000L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    // a t1: l=16000 b=0 f=16000
    // a t2: l=(0+3*16000)/4=12000; b=(12000-16000)/5=-800; f=12000-1600.
    // a t3: l=(8000+3*11200)/4=10400; b=((10400-12000)+4*(-800))/5=-960;
    //       f=10400-1920.
    assert(got == Set(
      ("a", 1L, 16000L, 0L, 16000L),
      ("a", 2L, 12000L, -800L, 10400L),
      ("a", 3L, 10400L, -960L, 8480L),
      ("b", 1L, 5000L, 0L, 5000L)))
  }

  test("holtFixedPoint divides truncating-toward-zero on negative trend") {
    import spark.implicits._
    // β=1/3: trend numerator at t2 is (12000-16000) = -4000; -4000/3
    // truncates to -1333 (floor would give -1334) — the DuckDB `//`
    // semantics the oracle depends on.
    val df = Seq(("a", 1L, 16L), ("a", 2L, 0L)).toDF("k", "t", "v")
    val got = TimeSeries.holtFixedPoint(df, "k", "t", "v",
        1L, 4L, 1L, 3L, horizon = 3L, scale = 1000L)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(2L) == ((12000L, -1333L, 12000L - 3L * 1333L)))
  }

  test("holtFixedPoint is partition-invariant") {
    import spark.implicits._
    val rows = (0 until 200).map(i => (s"k${i % 5}", i.toLong, (i * 37 % 100).toLong))
    def run(df: org.apache.spark.sql.DataFrame) =
      TimeSeries.holtFixedPoint(df, "k", "t", "v", 1L, 4L, 1L, 5L, 7L)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).sortBy(x => (x._1, x._2)).toSeq
    assert(run(rows.toDF("k", "t", "v")) ==
      run(rows.toDF("k", "t", "v").repartition(13)))
  }

  test("holtFixedPoint validates parameters") {
    import spark.implicits._
    val df = Seq(("a", 1L, 1L)).toDF("k", "t", "v")
    intercept[IllegalArgumentException] {
      TimeSeries.holtFixedPoint(df, "k", "t", "v", 0L, 4L, 1L, 5L, 1L)
    }
    intercept[IllegalArgumentException] {
      TimeSeries.holtFixedPoint(df, "k", "t", "v", 1L, 4L, 1L, 5L, -1L)
    }
  }

  test("cusum: closed form equals the sequential recurrence on both sides") {
    import spark.implicits._
    // target 0 → deviations are the values themselves: v = (-5, 3, 10).
    // high: 0, 3, 13; low: 5, 2, 0 (hand-stepped max(0, s±d)).
    val df = Seq(("a", 1L, -5L), ("a", 2L, 3L), ("a", 3L, 10L))
      .toDF("k", "t", "v").repartition(3)
    val got = TimeSeries.cusum(df, "k", "t", "v", target = 0L, threshold = 12L)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got(1L) == ((0L, 5L, false)))
    assert(got(2L) == ((3L, 2L, false)))
    assert(got(3L) == ((13L, 0L, true)))
  }

  test("cusum flags a planted level shift and resets after drops") {
    import spark.implicits._
    // steady at target, then a +5 shift for 4 steps: high side ramps
    // 5,10,15,20 and crosses 12 at t=7; low side stays 0 throughout.
    val rows = (1 to 4).map(i => ("s", i.toLong, 10L)) ++
      (5 to 8).map(i => ("s", i.toLong, 15L))
    val got = TimeSeries.cusum(rows.toDF("k", "t", "v"), "k", "t", "v",
        target = 10L, threshold = 12L)
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getBoolean(4))))
      .toMap
    assert((1 to 4).forall(t => got(t.toLong) == ((0L, false))))
    assert(got(5L) == ((5L, false)) && got(6L) == ((10L, false)))
    assert(got(7L) == ((15L, true)) && got(8L) == ((20L, true)))
  }

  test("cusum is deterministic on tied timestamps (deviation tiebreak)") {
    import spark.implicits._
    // Two rows share t=1 with opposite deviations: the (t, deviation)
    // ordering pins which folds first, so results are repartition-stable
    // and match StreamingCusum's (t, value) in-batch sort.
    val rows = Seq(("a", 1L, 10L), ("a", 1L, -10L), ("a", 2L, 3L))
    def run(parts: Int) =
      TimeSeries.cusum(rows.toDF("k", "t", "v").repartition(parts),
          "k", "t", "v", target = 0L, threshold = 100L)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(x => (x._1, x._2)).toSeq
    // -10 folds first (smaller deviation): c = -10, 0, 3.
    // high = c - min(0, runmin): 0, 10, 13; low = max(0, runmax) - c:
    // runmax = -10, 0, 3 -> 10, 0, 0.
    assert(run(1) == Seq((1L, 0L, 10L), (1L, 10L, 0L), (2L, 13L, 0L)))
    assert(run(7) == run(1))
  }

  test("cusum series isolation and partition invariance") {
    import spark.implicits._
    val rows = (0 until 300).map(i =>
      (s"k${i % 4}", i.toLong, ((i * 31) % 20 - 7).toLong))
    def run(df: org.apache.spark.sql.DataFrame) =
      TimeSeries.cusum(df, "k", "t", "v", target = 2L, threshold = 25L)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getBoolean(4))).sortBy(x => (x._1, x._2)).toSeq
    assert(run(rows.toDF("k", "t", "v")) ==
      run(rows.toDF("k", "t", "v").repartition(17)))
  }

  test("lagCovariance matches hand-computed numerators per lag") {
    import spark.implicits._
    // Series a: 1,2,4,8 — lag-1 pairs (1,2)(2,4)(4,8): n=3, Σxy=42,
    // Σx=7, Σy=14 → acov = 3*42 - 98 = 28. Lag-2 pairs (1,4)(2,8):
    // Σxy=20, Σx=3, Σy=12 → 2*20 - 36 = 4. Series b too short for lag 2.
    val df = Seq(
      ("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 4L), ("a", 4L, 8L),
      ("b", 1L, 5L), ("b", 2L, 7L)
    ).toDF("k", "t", "v").repartition(3)
    val got = TimeSeries.lagCovariance(df, "k", "t", "v", Seq(1, 2))
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got(("a", 1)) == ((3L, 28L)))
    assert(got(("a", 2)) == ((2L, 4L)))
    assert(got(("b", 1)) == ((1L, 0L))) // single pair: 1*35 - 5*7 = 0
    assert(!got.contains(("b", 2)))
  }

  test("lagCovariance detects a planted period-2 alternation") {
    import spark.implicits._
    // Alternating 0,10,0,10…: lag-1 strongly negative, lag-2 positive.
    val rows = (0 until 40).map(i => ("s", i.toLong, if (i % 2 == 0) 0L else 10L))
    val got = TimeSeries.lagCovariance(rows.toDF("k", "t", "v"), "k", "t", "v",
        Seq(1, 2))
      .collect().map(r => r.getInt(1) -> r.getLong(3)).toMap
    assert(got(1) < 0, s"lag-1 ${got(1)}")
    assert(got(2) > 0, s"lag-2 ${got(2)}")
  }
}
