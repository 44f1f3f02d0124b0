package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class FuzzyJoinSpec extends AnyFunSuite with SparkTestBase {

  test("blocked self-join finds in-block pairs within the distance bound") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha-01"), (2L, "alpha-02"), (3L, "alpha-99"),
      (4L, "beta-01"), (5L, "beta-011")).toDF("id", "name")
    val out = FuzzyJoin.selfJoin(df, "id", "name", prefixLen = 5, maxDist = 1)
      .as[(Long, Long, Int)].collect().toSet
    // alpha block: (1,2) dist 1; (1,3)/(2,3) dist 2 — excluded.
    // beta block: (4,5) dist 1 (one insertion).
    assert(out == Set((1L, 2L, 1), (4L, 5L, 1)))
  }

  test("pairs whose edit falls inside the blocking prefix are not compared") {
    import spark.implicits._
    val df = Seq((1L, "xavier"), (2L, "zavier")).toDF("id", "name")
    // dist 1, but first char differs → different blocks → no candidate.
    assert(FuzzyJoin.selfJoin(df, "id", "name", 1, 2).count() == 0)
    // prefixLen 0 → one block → found.
    assert(FuzzyJoin.selfJoin(df, "id", "name", 0, 2).count() == 1)
  }

  test("each unordered pair appears exactly once (a < b)") {
    import spark.implicits._
    val df = (1L to 6L).map(i => (i, s"w$i")).toDF("id", "name")
    val out = FuzzyJoin.selfJoin(df, "id", "name", 1, 2)
      .as[(Long, Long, Int)].collect()
    assert(out.length == 15) // C(6,2): all share block "w", all within dist 2
    assert(out.forall { case (a, b, _) => a < b })
    assert(out.map(p => (p._1, p._2)).distinct.length == 15)
  }
}
