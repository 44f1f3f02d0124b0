package graft.gold

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class IncrementalJoinSpec extends AnyFunSuite with SparkTestBase {

  private def rows(df: DataFrame) =
    df.collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq

  test("delta union equals a full recompute, including delta×delta matches") {
    import spark.implicits._
    val aOld = Seq((1, "a1"), (2, "a2")).toDF("k", "av")
    val dA = Seq((2, "a2new"), (9, "a9")).toDF("k", "av")   // 9 is new to BOTH
    val bOld = Seq((1, "b1"), (2, "b2")).toDF("k", "bv")
    val dB = Seq((1, "b1new"), (9, "b9")).toDF("k", "bv")
    val jOld = aOld.join(bOld, Seq("k"))
    val incr = jOld.unionByName(
      IncrementalJoin.joinDelta(aOld, dA, bOld, dB, Seq("k")))
    val full = aOld.unionByName(dA).join(bOld.unionByName(dB), Seq("k"))
    assert(rows(incr) == rows(full))
    // The key-9 pair can ONLY come from the delta×delta term.
    assert(rows(incr).exists(_.head == 9))
  }

  test("empty deltas add nothing") {
    import spark.implicits._
    val a = Seq((1, "a1")).toDF("k", "av")
    val b = Seq((1, "b1")).toDF("k", "bv")
    val none = a.filter("k < 0")
    assert(IncrementalJoin.joinDelta(a, none,
      b, b.filter("k < 0"), Seq("k")).count() == 0)
  }

  test("colliding non-key columns are rejected") {
    import spark.implicits._
    val a = Seq((1, "x")).toDF("k", "v")
    val b = Seq((1, "y")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      IncrementalJoin.joinDelta(a, a, b, b, Seq("k"))
    }
  }
}
