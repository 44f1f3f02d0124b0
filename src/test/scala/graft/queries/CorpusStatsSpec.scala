package graft.queries

import java.nio.file.Files

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

class CorpusStatsSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  /** Write (doc_id, text) rows as a documents.parquet fixture dir. */
  private def fixture(rows: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("corpusstats").toString
    rows.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  private def run(name: String, dir: String): DataFrame =
    CorpusStatsQueries.queries(name)(spark, dir)

  test("q_vocab_growth: hand-computed Heaps curve on 5 docs") {
    val dir = fixture(Seq(
      0L -> "a b", 1L -> "b c", 2L -> "a d d", 3L -> "b", 4L -> "e"))
    // lo=0, hi=5 → bucket(d) = 2d. New types: b0 {a,b}, b2 {c}, b4 {d},
    // b6 {}, b8 {e}. Token volumes: 2, 2, 3, 1, 1.
    val got = run("q_vocab_growth", dir).orderBy("bucket")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(
      (0, 2L, 2L, 2L, 2L),
      (2, 2L, 1L, 4L, 3L),
      (4, 3L, 1L, 7L, 4L),
      (6, 1L, 0L, 8L, 4L),
      (8, 1L, 1L, 9L, 5L)))
  }

  test("q_zipf_fit: exact 1/r distribution recovers slope -1") {
    // Counts 12, 6, 4, 3 = 12/r for ranks 1..4 → ln f = ln 12 − ln r:
    // a perfect power law with slope −1, intercept ln 12.
    val text = (Seq.fill(12)("a") ++ Seq.fill(6)("b") ++
      Seq.fill(4)("c") ++ Seq.fill(3)("d")).mkString(" ")
    val dir = fixture(Seq(0L -> text))
    val r = run("q_zipf_fit", dir).head
    assert(r.getLong(0) == 4L)
    assert(math.abs(r.getDouble(1) - (-1.0)) <= 1e-5, s"slope=${r.getDouble(1)}")
    assert(math.abs(r.getDouble(2) - math.log(12.0)) <= 1e-5)
  }

  test("q_rouge_bleu: clipped overlap, brevity penalty, zero-overlap pair") {
    val dir = fixture(Seq(
      0L -> "a b c", 1L -> "a b d", 2L -> "x x y", 3L -> "z"))
    val got = run("q_rouge_bleu", dir).orderBy("doc_ref").collect()
    assert(got.length == 3)
    // Pair (0,1): ov1 = |{a,b}| = 2 of 3 → 2/3; bigram ov = {"a b"} = 1
    // of 2 → 1/2; equal lengths → bp = 1 → bleu2 = √(2/3 · 1/2) = √⅓.
    val p01 = got(0)
    assert(p01.getLong(0) == 0L && p01.getLong(1) == 1L)
    assert(p01.getDouble(2) == 0.666667 && p01.getDouble(3) == 0.5)
    assert(p01.getDouble(4) == 0.666667 && p01.getDouble(5) == 0.5)
    assert(math.abs(p01.getDouble(6) - math.sqrt(1.0 / 3.0)) <= 1e-6)
    // Pair (1,2): zero overlap → all ratios 0, bleu 0.
    val p12 = got(1)
    assert(p12.getDouble(2) == 0.0 && p12.getDouble(6) == 0.0)
    // Pair (2,3): ref "x x y" (3 unigrams) vs cand "z" (1): zero overlap;
    // the cand is SHORTER, so bp < 1 would apply if overlap existed —
    // here bleu stays 0 and precision denominators are the cand's.
    val p23 = got(2)
    assert(p23.getDouble(2) == 0.0 && p23.getDouble(4) == 0.0)
    // Bigram side of a 1-token cand: no bigrams → prec2 NULL.
    assert(p23.isNullAt(5))
  }

  test("q_rouge_bleu: clipping caps repeated tokens at the cand count") {
    // ref "a a a b" vs cand "a b b": clipped unigram overlap =
    // min(3,1) + min(1,2) = 2 → rouge1 = 2/4, prec1 = 2/3.
    val dir = fixture(Seq(0L -> "a a a b", 1L -> "a b b"))
    val r = run("q_rouge_bleu", dir).head
    assert(r.getDouble(2) == 0.5)
    assert(r.getDouble(4) == 0.666667)
  }

  test("empty corpus: growth/pairs empty; zipf keeps its one-row shape") {
    val dir = fixture(Seq.empty)
    assert(run("q_vocab_growth", dir).count() == 0)
    assert(run("q_rouge_bleu", dir).count() == 0)
    val z = run("q_zipf_fit", dir).head
    assert(z.getLong(0) == 0L && z.isNullAt(1) && z.isNullAt(2))
  }

  test("q_rouge_bleu: brevity penalty fires on a shorter perfect candidate") {
    // ref "a b c d" (4 unigrams, 3 bigrams) vs cand "a b" (2, 1): both
    // precisions are 1.0, so BLEU-2 = bp·√(1·1) = exp(1 − 4/2) = e⁻¹.
    val dir = fixture(Seq(0L -> "a b c d", 1L -> "a b"))
    val r = run("q_rouge_bleu", dir).head
    assert(r.getDouble(4) == 1.0 && r.getDouble(5) == 1.0)
    assert(math.abs(r.getDouble(6) - math.exp(-1.0)) <= 1e-6)
  }
}
