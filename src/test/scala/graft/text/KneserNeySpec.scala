package graft.text

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class KneserNeySpec extends AnyFunSuite with SparkTestBase {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def scores(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    LmScore.knAvgLogProb(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("avg_klogp")).toMap

  test("hand-computed KN probability on a tiny corpus") {
    // Corpus bigrams: (a,b)x2, (a,c)x1, (b,c)x1  (docs below).
    // c1(a)=3, N1+(a·)=2; N1+(·b)=1, N1+(·c)=2; N1+(··)=3 pair types.
    // P(b|a) = (2-0.75)/3 + (0.75*2/3)*(1/3)
    val df = docs(1L -> "a b", 2L -> "a b", 3L -> "a c", 4L -> "b c")
    val pAB = (2.0 - 0.75) / 3.0 + (0.75 * 2.0 / 3.0) * (1.0 / 3.0)
    val got = scores(df)(1L)
    assert(math.abs(got - BigDecimal(math.log(pAB))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("continuation probability: versatile words beat single-context words") {
    // 'cat' follows three different contexts, 'dog' only one; from
    // context 'a' both were seen once, so MLE ties them — KN must prefer
    // the versatile continuation.
    val df = docs(
      1L -> "a cat", 2L -> "b cat", 3L -> "c cat",
      4L -> "a dog")
    val kn = scores(df)
    assert(kn(1L) > kn(4L),
      s"KN should score P(cat|a) above P(dog|a): ${kn(1L)} vs ${kn(4L)}")
    val mle = LmScore.avgLogProb(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("avg_logp")).toMap
    assert(mle(1L) === mle(4L), "MLE ties them — the contrast KN fixes")
  }

  test("scores are log-probabilities: every avg_klogp <= 0, docs < 2 tokens drop") {
    val df = docs(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown cat sleeps",
      3L -> "one") // no bigram → absent
    val kn = scores(df)
    assert(kn.keySet === Set(1L, 2L))
    assert(kn.values.forall(_ <= 0.0))
  }

  test("discount is validated") {
    intercept[IllegalArgumentException](
      LmScore.knAvgLogProb(docs(1L -> "a b"), "doc_id", "text", discount = 1.5))
  }

  test("cross-corpus backoff: every unseen case scores deterministically") {
    // Model corpus: (a,b)x2, (a,c), (b,c)  → c1(a)=3, n1v(a)=2, T=3,
    // n1w(b)=1, n1w(c)=2.
    val model = docs(1L -> "a b", 2L -> "a b", 3L -> "a c", 4L -> "b c")
    val targets = docs(
      10L -> "a b", // seen pair: full formula
      11L -> "a z", // seen context, w unseen anywhere: λ(a)·0 → floor
      12L -> "z c", // unseen context: P_cont(c) = 2/3
      13L -> "z q") // nothing seen: floor
    val got = LmScore.knCrossScore(model, targets, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Double]("avg_klogp"), r.getAs[Long]("n_unseen")))).toMap
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pAB = (2.0 - 0.75) / 3.0 + (0.75 * 2.0 / 3.0) * (1.0 / 3.0)
    assert(got(10L) === ((r4(math.log(pAB)), 0L)))
    assert(got(11L) === ((r4(math.log(1e-10)), 1L)))
    assert(got(12L) === ((r4(math.log(2.0 / 3.0)), 1L)))
    assert(got(13L) === ((r4(math.log(1e-10)), 1L)))
  }

  test("cross-score ranks reference-like docs above off-corpus docs") {
    val model = docs((1L to 6L).map(i => i -> "the cat sat on the mat"): _*)
    val targets = docs(
      100L -> "the cat sat on the mat",
      101L -> "zq xw vv uu tt ss")
    val got = LmScore.knCrossScore(model, targets, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("avg_klogp")).toMap
    assert(got(100L) > got(101L))
  }
}
