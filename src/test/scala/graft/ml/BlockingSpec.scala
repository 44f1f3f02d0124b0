package graft.ml

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BlockingSpec extends AnyFunSuite with SparkTestBase {

  private def recs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("id", "name")
  }

  test("neighbors in sort order pair within the window, others don't") {
    val df = recs(1L -> "alpha", 2L -> "alpos", 3L -> "beta",
      4L -> "gamma", 5L -> "zeta")
    val pairs = Blocking.sortedNeighborhood(df, "id", col("name"), w = 1)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // sort order: alpha(1) alpos(2) beta(3) gamma(4) zeta(5)
    assert(pairs == Set((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
  }

  test("w_dist is the rank distance; w widens the neighborhood") {
    val df = recs(1L -> "a", 2L -> "b", 3L -> "c", 4L -> "d")
    val pairs = Blocking.sortedNeighborhood(df, "id", col("name"), w = 2)
      .collect()
      .map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")),
        r.getAs[Int]("w_dist"))).toMap
    assert(pairs((1L, 3L)) == 2 && pairs((1L, 2L)) == 1)
    assert(!pairs.contains((1L, 4L))) // distance 3 > w
  }

  test("multi-pass catches a typo'd leading char that one pass misses") {
    // "zlpha" sorts far from "alpha" forward, but adjacent REVERSED
    // ("ahpla..." endings match) — the classic multi-pass win.
    val df = recs(1L -> "alpha", 2L -> "zlpha", 3L -> "mid", 4L -> "nid")
    val fwd = Blocking.sortedNeighborhood(df, "id", col("name"), w = 1)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(!fwd.contains((1L, 2L)))
    val multi = Blocking.multiPass(df, "id",
      Seq(col("name"), reverse(col("name"))), w = 1)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(multi.contains((1L, 2L)))
  }

  test("multi-pass normalizes pair order and keeps the smallest distance") {
    // Forward order a,b,c; reversed order happens to flip b and c, so the
    // (b,c) pair appears in both passes (possibly as (c,b)).
    val df = recs(1L -> "ab", 2L -> "ba", 3L -> "bb")
    val multi = Blocking.multiPass(df, "id",
      Seq(col("name"), reverse(col("name"))), w = 2)
      .collect()
    multi.foreach { r =>
      assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"))
      assert(r.getAs[Int]("w_dist") >= 1 && r.getAs[Long]("n_passes") >= 1)
    }
    // All three unordered pairs exist within w=2 of 3 records, each from
    // both passes.
    assert(multi.length == 3 && multi.forall(_.getAs[Long]("n_passes") == 2L))
  }
}
