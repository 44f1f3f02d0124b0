package graft.text

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class TfIdfSpec extends AnyFunSuite with SparkTestBase {

  test("hand-checked tf·ln(N/df) scores and top-k cut") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a b"),
      (2L, "a c c c")).toDF("doc_id", "text")
    val out = TfIdf.topTerms(docs, "doc_id", "text", 2)
      .as[(Long, String, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(r => (-r._4, r._2)).toList).toMap

    // N=2; df: a=2, b=1, c=1. ln(2)≈0.6931, ln(1)=0.
    val l2 = BigDecimal(math.log(2.0)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val t1 = out(1L)
    assert(t1.map(r => (r._2, r._3, r._4)) == List(("b", 1L, l2), ("a", 2L, 0.0)))
    val t2 = out(2L)
    val l2x3 = BigDecimal(3 * math.log(2.0)).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(t2.map(r => (r._2, r._3, r._4)) == List(("c", 3L, l2x3), ("a", 1L, 0.0)))
  }

  test("ties at the k boundary break by term ascending, deterministically") {
    import spark.implicits._
    // Every term unique to its doc with tf=1 → identical scores.
    val docs = Seq((1L, "d c b a")).toDF("doc_id", "text")
    val out = TfIdf.topTerms(docs, "doc_id", "text", 3)
      .as[(Long, String, Long, Double)].collect().map(_._2).sorted
    assert(out.toList == List("a", "b", "c"))
  }

  test("tokenization matches the dedup-family normalization (case/whitespace)") {
    import spark.implicits._
    val docs = Seq((1L, "  Foo\t\tFOO  bar "), (2L, "baz")).toDF("doc_id", "text")
    val rows = TfIdf.topTerms(docs, "doc_id", "text", 5)
      .as[(Long, String, Long, Double)].collect()
    val d1 = rows.filter(_._1 == 1L).map(r => r._2 -> r._3).toMap
    assert(d1 == Map("foo" -> 2L, "bar" -> 1L))
  }
}
