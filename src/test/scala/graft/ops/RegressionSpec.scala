package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class RegressionSpec extends AnyFunSuite with SparkTestBase {

  test("recovers a planted line exactly and a flat line with zero slope") {
    import spark.implicits._
    // g1: y = 2 + 3x (exact); g2: constant 7.
    val rows = (0L until 50L).flatMap(x =>
      Seq(("g1", x, 2.0 + 3.0 * x), ("g2", x, 7.0)))
    val got = Regression.groupTrend(rows.toDF("g", "x", "y"), Seq("g"), "x", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val (n1, s1, i1) = got("g1")
    assert(n1 == 50L && math.abs(s1 - 3.0) < 1e-9 && math.abs(i1 - 2.0) < 1e-9)
    val (_, s2, i2) = got("g2")
    assert(math.abs(s2) < 1e-9 && math.abs(i2 - 7.0) < 1e-9)
  }

  test("zero x-variance yields NULL slope; result is partition-invariant") {
    import spark.implicits._
    val vert = Seq(("v", 5L, 1.0), ("v", 5L, 9.0)).toDF("g", "x", "y")
    val r = Regression.groupTrend(vert, Seq("g"), "x", "y").head()
    assert(r.isNullAt(2) && r.isNullAt(3))

    val rows = (0 until 300).map(i => (s"g${i % 3}", (i % 41).toLong, i * 0.13))
    def run(df: org.apache.spark.sql.DataFrame) =
      Regression.groupTrend(df, Seq("g"), "x", "y")
        .collect().map(r => (r.getString(0), r.getDouble(2), r.getDouble(3)))
        .sortBy(_._1).toSeq
    assert(run(rows.toDF("g", "x", "y")) ==
      run(rows.toDF("g", "x", "y").repartition(17)))
  }
}
