package graft.ml

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class RankingSpec extends AnyFunSuite with SparkTestBase {

  private def runsDf(rows: Seq[(String, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("q", "d", "rk").repartition(3)
  }
  private def labDf(rows: Seq[(String, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("q", "d", "rel").repartition(2)
  }

  private def metrics(runs: Seq[(String, Long, Long)],
      labels: Seq[(String, Long, Long)], k: Int = 10) =
    Ranking.ndcgMrrAtK(runsDf(runs), labDf(labels), "q", "d", "rk", "rel", k)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))))
      .toMap

  private def dcgOf(relAtRank: Seq[(Long, Long)]): Double =
    relAtRank.map { case (rel, rk) =>
      (math.pow(2.0, rel.toDouble) - 1.0) /
        (math.log(rk + 1.0) / math.log(2.0))
    }.sum

  test("hand-computed graded DCG/IDCG/MRR on a 3-doc query") {
    // labels: d1 rel 3, d2 rel 1, d3 rel 0; run ranks d2, d1, d3.
    val got = metrics(
      runs = Seq(("q1", 2L, 1L), ("q1", 1L, 2L), ("q1", 3L, 3L)),
      labels = Seq(("q1", 1L, 3L), ("q1", 2L, 1L), ("q1", 3L, 0L)))
    val (nRanked, nRel, dcg, idcg, ndcg, mrr) = got("q1")
    assert(nRanked == 3L && nRel == 2L)
    assert(math.abs(dcg - dcgOf(Seq(1L -> 1L, 3L -> 2L))) < 1e-5)
    assert(math.abs(idcg - dcgOf(Seq(3L -> 1L, 1L -> 2L))) < 1e-5)
    assert(math.abs(ndcg - dcg / idcg) < 1e-5)
    assert(mrr == 1.0)
  }

  test("the ideal ordering scores ndcg exactly 1") {
    val got = metrics(
      runs = Seq(("q1", 1L, 1L), ("q1", 2L, 2L), ("q1", 3L, 3L)),
      labels = Seq(("q1", 1L, 3L), ("q1", 2L, 1L), ("q1", 3L, 0L)))
    assert(got("q1")._5 == 1.0)
    // ...and any other ordering scores strictly less.
    val worse = metrics(
      runs = Seq(("q1", 3L, 1L), ("q1", 2L, 2L), ("q1", 1L, 3L)),
      labels = Seq(("q1", 1L, 3L), ("q1", 2L, 1L), ("q1", 3L, 0L)))
    assert(worse("q1")._5 < 1.0)
  }

  test("no relevant results in the top k: ndcg and mrr are 0; " +
      "unlabeled ranked docs count as rel 0") {
    val got = metrics(
      runs = Seq(("q1", 7L, 1L), ("q1", 8L, 2L)),
      labels = Seq(("q1", 1L, 2L)))  // the relevant doc was never ranked
    val (nRanked, nRel, dcg, idcg, ndcg, mrr) = got("q1")
    assert(nRanked == 2L && nRel == 0L && dcg == 0.0)
    assert(idcg > 0.0) // the query HAS a relevant doc, so IDCG is real
    assert(ndcg == 0.0 && mrr == 0.0)
  }

  test("a query with no positive labels at all lands at 0, not null") {
    val got = metrics(
      runs = Seq(("q1", 1L, 1L)),
      labels = Seq(("q1", 1L, 0L)))
    val (_, _, _, idcg, ndcg, mrr) = got("q1")
    assert(idcg == 0.0 && ndcg == 0.0 && mrr == 0.0)
  }

  test("k truncates BOTH the run and the ideal ranking") {
    // 3 relevant docs, k=2: run finds the two weakest in reverse order.
    val labels = Seq(("q1", 1L, 3L), ("q1", 2L, 2L), ("q1", 3L, 1L))
    val got = metrics(
      runs = Seq(("q1", 3L, 1L), ("q1", 2L, 2L), ("q1", 1L, 3L)),
      labels = labels, k = 2)
    val (nRanked, _, dcg, idcg, _, mrr) = got("q1")
    assert(nRanked == 2L)
    assert(math.abs(dcg - dcgOf(Seq(1L -> 1L, 2L -> 2L))) < 1e-5)
    assert(math.abs(idcg - dcgOf(Seq(3L -> 1L, 2L -> 2L))) < 1e-5)
    assert(mrr == 1.0)
  }

  test("empty run yields an empty frame with the full schema") {
    val out = Ranking.ndcgMrrAtK(runsDf(Nil), labDf(Nil),
      "q", "d", "rk", "rel", 10)
    assert(out.columns.toSeq == Seq("query_id", "n_ranked", "n_rel",
      "dcg", "idcg", "ndcg", "mrr"))
    assert(out.count() == 0)
  }

  test("queries score independently and the result is " +
      "partitioning-invariant") {
    val runs = (1 to 200).map(i =>
      ("q" + (i % 5), i.toLong, (i / 5 + 1).toLong))
    val labels = (1 to 200).map(i => ("q" + (i % 5), i.toLong, (i % 3).toLong))
    val a = metrics(runs, labels)
    val b = Ranking.ndcgMrrAtK(runsDf(runs).repartition(13),
        labDf(labels).repartition(7), "q", "d", "rk", "rel", 10)
      .collect().map(r => r.getString(0) -> r.getDouble(5)).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (q, (_, _, _, _, ndcg, _)) => assert(ndcg == b(q)) }
  }
}
