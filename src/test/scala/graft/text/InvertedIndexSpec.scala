package graft.text

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class InvertedIndexSpec extends AnyFunSuite with SparkTestBase {

  test("postings sort by doc id with per-doc tf; df/cf exact") {
    import spark.implicits._
    val df = Seq(
      (10L, "apple banana apple"),
      (2L, "banana cherry"),
      (7L, "Apple  CHERRY apple cherry")).toDF("doc_id", "text")
    val idx = InvertedIndex.build(df, "doc_id", "text")
      .as[(String, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(idx("apple") == ((2L, 4L, "7:2,10:2")))   // normalized case folds
    assert(idx("banana") == ((2L, 2L, "2:1,10:1")))
    assert(idx("cherry") == ((2L, 3L, "2:1,7:2")))
  }

  test("minDf prunes hapax terms, maxDf cuts stop words") {
    import spark.implicits._
    val df = Seq(
      (1L, "the unique1 common"),
      (2L, "the common"),
      (3L, "the common"),
      (4L, "the")).toDF("doc_id", "text")
    val terms = InvertedIndex.build(df, "doc_id", "text", minDf = 2, maxDf = 3)
      .select("term").as[String].collect().toSet
    assert(terms == Set("common")) // "unique1" df=1 < 2; "the" df=4 > 3
  }

  test("postings are partition-invariant") {
    import spark.implicits._
    val rows = (0L until 300L).map(i => (i, s"t${i % 9} shared t${i % 4}"))
    val a = InvertedIndex.build(rows.toDF("doc_id", "text").repartition(1),
      "doc_id", "text").orderBy("term").collect().toSeq
    val b = InvertedIndex.build(rows.toDF("doc_id", "text").repartition(17),
      "doc_id", "text").orderBy("term").collect().toSeq
    assert(a == b)
  }

  test("conjunctive lookup matches brute-force filtering") {
    import spark.implicits._
    val df = Seq(
      (1L, "x y z"), (2L, "x z"), (3L, "y z"), (4L, "x y q")).toDF("doc_id", "text")
    val got = InvertedIndex.lookupAll(df, "doc_id", "text", Seq("x", "y"))
      .as[Long].collect().toSet
    assert(got == Set(1L, 4L))
  }
}
