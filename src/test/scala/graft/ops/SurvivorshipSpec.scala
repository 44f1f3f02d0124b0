package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SurvivorshipSpec extends AnyFunSuite with SparkTestBase {

  test("per-field latest non-null wins; all-null fields stay null") {
    import spark.implicits._
    val feed = Seq(
      (1L, 10L, Option("a@x"), Option.empty[String]),
      (1L, 30L, Option.empty[String], Option("555")), // later but null email
      (1L, 20L, Option("b@x"), Option("111")),
      (2L, 5L, Option.empty[String], Option.empty[String])
    ).toDF("k", "ord", "email", "phone")
    val got = Survivorship.goldenRecord(feed, "k", "ord", Seq("email", "phone"))
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), Option(r.getString(2)), r.getLong(3)))).toMap
    // email: latest NON-NULL is ord=20 ("b@x"), not ord=30's null.
    assert(got(1L) == ((Some("b@x"), Some("555"), 3L)))
    assert(got(2L) == ((None, None, 1L)))
  }

  test("partition-invariant and single-shuffle (no window, no join)") {
    import spark.implicits._
    val rows = (0 until 300).map { i =>
      (i % 20L, i.toLong,
        if (i % 3 == 0) null else s"v$i", if (i % 5 == 0) s"p$i" else null)
    }
    val df = rows.toDF("k", "ord", "a", "b")
    def run(d: org.apache.spark.sql.DataFrame) =
      Survivorship.goldenRecord(d, "k", "ord", Seq("a", "b"))
        .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(run(df) == run(df.repartition(13)))
    val plan = Survivorship.goldenRecord(df, "k", "ord", Seq("a", "b"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("Join"), plan)
    assert(plan.contains("partial_max_by") || plan.contains("partial_"), plan)
  }
}
