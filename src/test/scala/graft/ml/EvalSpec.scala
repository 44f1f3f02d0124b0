package graft.ml

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class EvalSpec extends AnyFunSuite with SparkTestBase {

  private def auc(rows: Seq[(Long, Boolean)]): (Long, Long, Long) = {
    import spark.implicits._
    val df = rows.toDF("s", "y").repartition(3)
    val r = Eval.aucExact(df, col("s"), col("y")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("perfect separation gives AUC 1, inverted gives 0") {
    // Positives all score above negatives.
    val perfect = Seq((10L, true), (11L, true), (1L, false), (2L, false))
    assert(auc(perfect) == ((2L, 2L, 8L))) // 8 / (2*2*2) = 1.0
    val inverted = perfect.map { case (s, y) => (s, !y) }
    assert(auc(inverted) == ((2L, 2L, 0L)))
  }

  test("ties count half: identical scores give AUC 0.5") {
    val allTied = Seq((5L, true), (5L, false), (5L, true), (5L, false))
    // num_x2 = sum over pos of (2*0 + 2) = 4; AUC = 4 / (2*2*2) = 0.5.
    assert(auc(allTied) == ((2L, 2L, 4L)))
  }

  test("hand-computed mixed case") {
    // scores: pos {3, 1}, neg {2}. Pairs: (3>2)=1, (1<2)=0 → AUC=0.5.
    val rows = Seq((3L, true), (1L, true), (2L, false))
    val (p, n, x2) = auc(rows)
    assert(p == 2L && n == 1L)
    assert(x2 == 2L) // 2 / (2*2*1) = 0.5
  }

  test("NaN scores rank above every finite score (tileOf routes NaN to " +
      "the top tile, matching both engines' sort order)") {
    import spark.implicits._
    // pos {NaN, 1.0}, neg {2.0}: NaN > 2.0 under the total order both
    // Spark and DuckDB sort by, 1.0 < 2.0 → AUC = 0.5, num_x2 = 2.
    val df = Seq((Double.NaN, true), (2.0, false), (1.0, true))
      .toDF("s", "y").repartition(3)
    val r = Eval.aucExact(df, col("s"), col("y")).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 1L, 2L)))
    // All-NaN-positive corner: perfect separation regardless of tiling.
    val df2 = Seq((Double.NaN, true), (5.0, false), (7.0, false))
      .toDF("s", "y").repartition(2)
    val r2 = Eval.aucExact(df2, col("s"), col("y")).head()
    assert((r2.getLong(0), r2.getLong(1), r2.getLong(2)) == ((1L, 2L, 4L)))
  }

  test("partition-invariant") {
    import spark.implicits._
    val rows = (0 until 500).map(i => ((i * 7 % 97).toLong, i % 3 == 0))
    val a = Eval.aucExact(rows.toDF("s", "y").coalesce(1), col("s"), col("y")).head()
    val b = Eval.aucExact(rows.toDF("s", "y").repartition(11), col("s"), col("y")).head()
    assert(a == b)
  }

  test("rocPoints hand-computed confusion matrices at every threshold") {
    import spark.implicits._
    // pos scores {3, 1}, neg scores {2, 2}. P=2, N=2.
    val df = Seq((3L, true), (1L, true), (2L, false), (2L, false))
      .toDF("s", "y").repartition(3)
    val pts = Eval.rocPoints(df, col("s"), col("y"))
      .orderBy(desc("thr"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(pts.toSeq == Seq(
      (3L, 1L, 0L, 1L, 2L), // thr=3: only the top positive predicted
      (2L, 1L, 2L, 1L, 0L), // thr=2: both negatives join in
      (1L, 2L, 2L, 0L, 0L)  // thr=1: everything predicted positive
    ))
  }

  test("rocPoints row count is distinct-score cardinality and ends at (P, N)") {
    import spark.implicits._
    val rows = (0 until 400).map(i => ((i * 13 % 53).toLong, i % 4 == 0))
    val df = rows.toDF("s", "y").repartition(7)
    val pts = Eval.rocPoints(df, col("s"), col("y"))
    assert(pts.count() == rows.map(_._1).distinct.size)
    val last = pts.orderBy(asc("thr")).head()
    assert(last.getLong(1) == rows.count(_._2)) // tp at min thr = P
    assert(last.getLong(2) == rows.count(!_._2)) // fp at min thr = N
    // every row: tp+fn = P, fp+tn = N
    pts.collect().foreach { r =>
      assert(r.getLong(1) + r.getLong(3) == rows.count(_._2))
      assert(r.getLong(2) + r.getLong(4) == rows.count(!_._2))
    }
  }

  test("averagePrecision: perfect ranking gives AP 1, hand-checked mix") {
    import spark.implicits._
    val perfect = Seq((10L, true), (9L, true), (1L, false))
      .toDF("s", "y").repartition(2)
    val r = Eval.averagePrecision(perfect, col("s"), col("y")).head()
    // terms: thr=10 → 1·(1/1); thr=9 → 1·(2/2); AP = 2e9 / (1e9·2) = 1.
    assert(r.getLong(0) == 2L && r.getLong(1) == 2000000000L)
    // pos at ranks 1 and 3: AP = (1/1 + 2/3)/2 = 5/6.
    val mixed = Seq((10L, true), (9L, false), (8L, true))
      .toDF("s", "y").repartition(2)
    val m = Eval.averagePrecision(mixed, col("s"), col("y")).head()
    assert(m.getLong(0) == 2L)
    assert(m.getLong(1) == 1000000000L + math.floor((2.0 / 3.0) * 1e9).toLong)
  }

  test("averagePrecision partition-invariant on a continuous score") {
    import spark.implicits._
    val rows = (0 until 300).map(i => (i + 1.0 / (i + 2.0), i % 5 == 0))
    val a = Eval.averagePrecision(rows.toDF("s", "y").coalesce(1),
      col("s"), col("y")).head()
    val b = Eval.averagePrecision(rows.toDF("s", "y").repartition(13),
      col("s"), col("y")).head()
    assert(a == b)
  }

  test("calibrationBins: hand-checked bins, clamp at 1.0, null drop") {
    import spark.implicits._
    val df = Seq(
      (0.05, true), (0.07, false),          // bin 0: n=2 pos=1
      (0.95, true), (1.0, true),            // bin 9 (1.0 clamps): n=2 pos=2
      (0.55, false)                         // bin 5: n=1 pos=0
    ).toDF("pr", "y").repartition(2)
    val bins = Eval.calibrationBins(df, col("pr"), col("y"), bins = 10)
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(bins.map(t => (t._1, t._2, t._3)).toSeq ==
      Seq((0L, 2L, 1L), (5L, 1L, 0L), (9L, 2L, 2L)))
    // quantized score mass: bin 0 = floor(.05e9)+floor(.07e9)
    assert(bins(0)._4 ==
      math.floor(0.05 * 1e9).toLong + math.floor(0.07 * 1e9).toLong)
    assert(Eval.calibrationBins(
      Seq[(java.lang.Double, Boolean)]((null, true)).toDF("pr", "y"),
      col("pr"), col("y"), bins = 10).count() == 0L)
  }

  test("calibrationBins rejects non-positive bin count") {
    import spark.implicits._
    val df = Seq((0.5, true)).toDF("pr", "y")
    intercept[IllegalArgumentException] {
      Eval.calibrationBins(df, col("pr"), col("y"), bins = 0)
    }
  }
}
