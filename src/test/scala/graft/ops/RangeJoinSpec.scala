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

  test("intervalOverlap matches the nested loop; multi-bin pairs emit once") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val l = (0L until 120L).map { i =>
      val s = rnd.nextInt(1000).toLong; (i, s, s + rnd.nextInt(80).toLong)
    }
    val r = (0L until 120L).map { i =>
      val s = rnd.nextInt(1000).toLong; (i, s, s + rnd.nextInt(80).toLong)
    }
    val expected = (for {
      (li, ls, le) <- l; (ri, rs, re) <- r if ls <= re && rs <= le
    } yield (li, ri)).toSet
    for (bw <- Seq(7L, 64L, 512L)) {
      val got = RangeJoin.intervalOverlap(
        l.toDF("l_id", "ls", "le"), r.toDF("r_id", "rs", "re"),
        "ls", "le", "rs", "re", bw)
        .select("l_id", "r_id").as[(Long, Long)].collect()
      assert(got.length == got.toSet.size, s"duplicates at bin $bw")
      assert(got.toSet == expected, s"bin $bw")
    }
  }

  test("intervalOverlap: touch-inclusive bounds, keyed blocking, degenerates") {
    import spark.implicits._
    val l = Seq(("u1", 1L, 10L, 20L), ("u1", 2L, 30L, 25L), // degenerate
      ("u2", 3L, 10L, 20L)).toDF("k", "l_id", "ls", "le")
    val r = Seq(("u1", 7L, 20L, 40L),  // touches l1 at 20 → match
      ("u2", 8L, 21L, 40L),            // just misses u2's l3
      ("u1", 9L, 26L, 31L))            // would overlap the degenerate row
      .toDF("k", "r_id", "rs", "re")
    val got = RangeJoin.intervalOverlap(l, r, "ls", "le", "rs", "re", 16L,
      keyCols = Seq("k")).select("l_id", "r_id")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 7L)))
  }

  test("intervalOverlap plans as an equi-join, not a nested loop") {
    import spark.implicits._
    val l = Seq((1L, 10L, 20L)).toDF("l_id", "ls", "le")
    val r = Seq((2L, 15L, 25L)).toDF("r_id", "rs", "re")
    val plan = RangeJoin.intervalOverlap(l, r, "ls", "le", "rs", "re", 8L)
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
