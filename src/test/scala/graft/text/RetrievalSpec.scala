package graft.text

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class RetrievalSpec extends AnyFunSuite with SparkTestBase {

  private def ranking(rows: (Long, Int)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "rank")
  }

  test("rrf sums 1/(k+rank) across lists; absent list contributes 0") {
    val sparse = ranking(10L -> 1, 11L -> 2)
    val dense = ranking(11L -> 1, 12L -> 2)
    val out = Retrieval.rrfFuse(Seq(sparse, dense), "doc_id", "rank")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("rrf"))
      .toMap
    assert(out(10L) == 1.0 / 61)
    assert(out(11L) == 1.0 / 62 + 1.0 / 61)
    assert(out(12L) == 1.0 / 62)
  }

  test("an item ranked first everywhere beats one ranked first in one list") {
    val a = ranking(1L -> 1, 2L -> 2)
    val b = ranking(1L -> 1, 3L -> 2)
    val top = Retrieval.rrfFuse(Seq(a, b), "doc_id", "rank")
      .orderBy(org.apache.spark.sql.functions.col("rrf").desc)
      .collect().head
    assert(top.getAs[Long]("doc_id") == 1L)
  }

  test("custom k changes the discount") {
    val a = ranking(5L -> 3)
    val out = Retrieval.rrfFuse(Seq(a), "doc_id", "rank", kRrf = 10)
      .collect().head
    assert(out.getAs[Double]("rrf") == 1.0 / 13)
  }
}
