package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite with SparkTestBase {

  test("matches the nested-loop formulation on random data, several bin widths") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val points = Seq.fill(300)((rng.nextInt(1000).toLong, rng.nextLong().abs % 100))
      .zipWithIndex.map { case ((t, w), i) => (i.toLong, t, w) }
      .toDF("pid", "t", "weight")
    val ivs = Seq.fill(60) {
      val s = rng.nextInt(1000).toLong
      (s, s + rng.nextInt(50).toLong)
    }.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
      .toDF("iid", "s", "e")

    val want = points.crossJoin(ivs)
      .filter(col("t") >= col("s") && col("t") <= col("e"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    Seq(1L, 7L, 32L, 1000L).foreach { w =>
      val got = RangeJoin.pointInInterval(points, ivs, "t", "s", "e", w)
        .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, s"binWidth $w")
    }
  }

  test("degenerate and boundary intervals behave (inclusive ends, empty ranges)") {
    import spark.implicits._
    val points = Seq((1L, 10L), (2L, 20L), (3L, 21L)).toDF("pid", "t")
    val ivs = Seq((100L, 10L, 20L), (200L, 30L, 25L)).toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(points, ivs, "t", "s", "e", 8L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 100L), (2L, 100L))) // both bounds inclusive; 30>25 matches nothing
  }

  test("plans as an equi-join on the bin, not a nested loop") {
    import spark.implicits._
    val points = Seq((1L, 10L)).toDF("pid", "t")
    val ivs = Seq((100L, 10L, 20L)).toDF("iid", "s", "e")
    val plan = RangeJoin.pointInInterval(points, ivs, "t", "s", "e", 8L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("timestamp axis: binning prunes, exact match keeps sub-bin precision") {
    import spark.implicits._
    val points = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-05 12:30:00")),
      (2L, java.sql.Timestamp.valueOf("2024-01-09 00:00:01")))
      .toDF("pid", "t")
    val ivs = Seq(
      (10L, java.sql.Timestamp.valueOf("2024-01-05 00:00:00"),
        java.sql.Timestamp.valueOf("2024-01-09 00:00:00")))
      .toDF("iid", "s", "e")
    val got = RangeJoin.pointInInterval(points, ivs, "t", "s", "e", 86400L)
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L)) // pid 2 is 1 s past the inclusive end
  }
}
