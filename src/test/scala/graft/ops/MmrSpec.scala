package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MmrSpec extends AnyFunSuite with SparkTestBase {

  // Candidates on the unit circle in 2D: relevance is handed in
  // explicitly, similarity is the cosine of the angle between vectors.
  private def cands(rows: (Long, Long, Array[Float], Double)*) = {
    import spark.implicits._
    rows.toDF("q", "id", "vec", "rel")
  }

  private def vec(deg: Double): Array[Float] = {
    val r = math.toRadians(deg)
    Array(math.cos(r).toFloat, math.sin(r).toFloat)
  }

  test("pick 1 is pure relevance; pick 2 trades relevance for diversity") {
    // id 1 and 2 nearly identical directions (high mutual sim), id 3
    // orthogonal with slightly lower relevance: MMR must pick 1 then 3,
    // where pure relevance would pick 1 then 2.
    val df = cands(
      (0L, 1L, vec(0), 0.99),
      (0L, 2L, vec(2), 0.98),
      (0L, 3L, vec(90), 0.90))
    val out = Mmr.select(df, "q", "id", "vec", "rel", k = 2)
      .orderBy("pick").collect().map(_.getAs[Long]("id")).toSeq
    assert(out == Seq(1L, 3L))
  }

  test("lambda = 1 degenerates to pure relevance ranking") {
    val df = cands(
      (0L, 1L, vec(0), 0.99),
      (0L, 2L, vec(1), 0.98),
      (0L, 3L, vec(90), 0.90))
    val out = Mmr.select(df, "q", "id", "vec", "rel", k = 3,
      lambdaNum = 1, lambdaDen = 1)
      .orderBy("pick").collect().map(_.getAs[Long]("id")).toSeq
    assert(out == Seq(1L, 2L, 3L))
  }

  test("queries are independent and k caps at the pool size") {
    val df = cands(
      (0L, 1L, vec(0), 0.9), (0L, 2L, vec(45), 0.8),
      (1L, 5L, vec(10), 0.7))
    val out = Mmr.select(df, "q", "id", "vec", "rel", k = 3).collect()
    val q0 = out.filter(_.getAs[Long]("q") == 0L).map(_.getAs[Long]("id")).toSet
    val q1 = out.filter(_.getAs[Long]("q") == 1L).map(_.getAs[Long]("id")).toSet
    assert(q0 == Set(1L, 2L) && q1 == Set(5L))
    // No query exceeds its pool: 2 + 1 picks total.
    assert(out.length == 3)
  }

  test("ties break on smaller id") {
    val df = cands(
      (0L, 9L, vec(0), 0.5),
      (0L, 4L, vec(0), 0.5))
    val first = Mmr.select(df, "q", "id", "vec", "rel", k = 1)
      .collect().head
    assert(first.getAs[Long]("id") == 4L)
  }
}
