package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class LmScoreSpec extends AnyFunSuite with SparkTestBase {

  // Corpus: c(a b)=4, c(a c)=1, c(b a)=1 → p(b|a)=0.8, p(c|a)=0.2, p(a|b)=1.
  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "a b"),
      (2L, "a c"),
      (3L, "a b"),
      (4L, "a b a b"),
      (5L, "z")          // one token → no bigrams → absent from output
    ).toDF("doc_id", "text")
  }

  test("hand-computed average bigram log-likelihoods") {
    val got = LmScore.avgLogProb(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    // Corpus bigrams: d1 (a b); d2 (a c); d3 (a b); d4 (a b),(b a),(a b).
    // c(a,b)=4, c(a,c)=1 → c1(a)=5; c(b,a)=1 → c1(b)=1.
    val lnAb = math.log(4.0 / 5.0)
    val lnAc = math.log(1.0 / 5.0)
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq(
      (1L, 1L, r4(lnAb)),
      (2L, 1L, r4(lnAc)),
      (3L, 1L, r4(lnAb)),
      (4L, 3L, r4((2 * lnAb + math.log(1.0)) / 3))))
  }

  test("scores are partition-invariant (ordered fold)") {
    val a = LmScore.avgLogProb(corpus, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).sortBy(_._1).toSeq
    val b = LmScore.avgLogProb(corpus.repartition(7), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).sortBy(_._1).toSeq
    assert(a == b)
  }
}
