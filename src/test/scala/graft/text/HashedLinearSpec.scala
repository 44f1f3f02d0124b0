package graft.text

import graft.SparkTestBase
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HashedLinearSpec extends AnyFunSuite with SparkTestBase {

  private val dim = 1 << 12

  /** Feature id of a literal token, via the same expression the scorer
    * uses — so the fixture weight table targets exactly those buckets.
    */
  private def fid(tok: String): Long = {
    import spark.implicits._
    Seq(tok).toDF("t")
      .select(HashedLinear.featureId(col("t"), dim)).as[Long].head()
  }

  private def weightsFor(ws: Map[String, Long]): DataFrame = {
    import spark.implicits._
    ws.map { case (t, w) => (fid(t), w) }.toSeq.toDF("feature", "weight_milli")
  }

  private def score(docs: Seq[(Long, String)], weights: DataFrame,
      bias: Long = 0L): Map[Long, (Long, Boolean)] = {
    import spark.implicits._
    HashedLinear.score(docs.toDF("id", "text"), "id", "text", weights, dim, bias)
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap
  }

  test("bag-of-words dot product: occurrences multiply, unknown tokens weigh 0") {
    val w = weightsFor(Map("good" -> 1000L, "bad" -> -1000L))
    val out = score(Seq(
      (1L, "good good story"),       // 2*1000 + 0
      (2L, "bad"),                   // -1000
      (3L, "good bad"),              // 0 → keep = false (strict >)
      (4L, "nothing matches here")), w)
    assert(out(1L) == (2000L, true))
    assert(out(2L) == (-1000L, false))
    assert(out(3L) == (0L, false))
    assert(out(4L) == (0L, false))
  }

  test("normalization folds case/whitespace before hashing; bias shifts the gate") {
    val w = weightsFor(Map("good" -> 100L))
    assert(score(Seq((1L, "  GOOD \t good ")), w) == Map(1L -> (200L, true)))
    assert(score(Seq((1L, "meh")), w, bias = 500L) == Map(1L -> (500L, true)))
    assert(score(Seq((1L, "good")), w, bias = -100L) == Map(1L -> (0L, false)))
  }

  test("empty and whitespace-only docs drop (no features to score)") {
    val out = score(Seq((1L, ""), (2L, "   "), (3L, "x")), weightsFor(Map("x" -> 1L)))
    assert(out.keySet == Set(3L))
  }

  test("synthetic weights match the closed form and stay in [-1000, 1000]") {
    import spark.implicits._
    val w = HashedLinear.syntheticWeights(spark, 64).as[(Long, Long)].collect()
    assert(w.length == 64)
    w.foreach { case (f, m) =>
      assert(m == (f * 2654435761L) % 2001 - 1000)
      assert(m >= -1000 && m <= 1000)
    }
  }

  test("score is partitioning-invariant (exact integer sum)") {
    import spark.implicits._
    val docs = (0L until 50L).map(i => (i, s"tok${i % 7} good tok${i % 3}"))
    val w = weightsFor(Map("good" -> 77L, "tok1" -> -5L))
    val one = HashedLinear.score(docs.toDF("id", "text").repartition(1),
      "id", "text", w, dim).orderBy("id").collect().toSeq
    val many = HashedLinear.score(docs.toDF("id", "text").repartition(13),
      "id", "text", w, dim).orderBy("id").collect().toSeq
    assert(one == many)
  }
}
