package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class DistinctiveSpec extends AnyFunSuite with SparkTestBase {

  test("a planted over-indexing term tops its source; shared terms do not") {
    import spark.implicits._
    // 'zebra' lives only in source a; 'the' is uniform background.
    val docs = (
      (1 to 30).map(i => ("a", "the zebra runs")) ++
      (1 to 30).map(i => ("b", "the horse walks"))
    ).toDF("source", "text")
    val got = Distinctive.chiSquaredTerms(docs, "source", "text", k = 2,
      minCount = 10L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(3)))
    val aTop = got.filter(_._1 == "a").sortBy(-_._3)
    assert(aTop.head._2 == "zebra" || aTop.head._2 == "runs") // both exclusive
    // 'the' appears everywhere: never distinctive for either source.
    assert(!got.exists(_._2 == "the"))
    // Scores of exclusive terms are symmetric across the two sources.
    val bTop = got.filter(_._1 == "b").sortBy(-_._3)
    assert(math.abs(aTop.head._3 - bTop.head._3) < 1e-9)
  }

  test("minCount suppresses rare terms and results are partition-invariant") {
    import spark.implicits._
    val docs = ((1 to 20).map(_ => ("a", "alpha beta")) ++
      Seq(("a", "rareword here")) ++
      (1 to 20).map(_ => ("b", "gamma beta"))).toDF("source", "text")
    val hi = Distinctive.chiSquaredTerms(docs, "source", "text", 5, 10L)
      .collect().map(_.getString(1)).toSet
    assert(!hi.contains("rareword"))
    def run(df: org.apache.spark.sql.DataFrame) =
      Distinctive.chiSquaredTerms(df, "source", "text", 5, 2L)
        .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(run(docs) == run(docs.repartition(9)))
  }
}
