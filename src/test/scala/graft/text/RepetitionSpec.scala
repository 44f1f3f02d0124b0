package graft.text

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class RepetitionSpec extends AnyFunSuite with SparkTestBase {

  private def profile(rows: (Long, String)*): Map[Long, (Long, Double, Double, Double)] = {
    import spark.implicits._
    Repetition.profile(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
  }

  test("hand-checked fractions on a small repetitive doc") {
    // tokens: a a a b       -> 4 total, 2 distinct -> dup_token 0.5
    // bigrams: "a a" x2, "a b" -> top 2/3 = 0.6667
    // trigrams: "a a a", "a a b" -> all distinct -> dup_trigram 0
    val got = profile(1L -> "a a a b")
    assert(got(1L) == ((4L, 0.5, 0.6667, 0.0)))
  }

  test("fully repeated doc maxes every fraction") {
    // "x x x x x": tokens 5/1 distinct -> 0.8; bigram "x x" x4 -> top 1.0;
    // trigrams "x x x" x3 -> dup (3-1)/3 = 0.6667
    val got = profile(7L -> "x x x x x")
    assert(got(7L) == ((5L, 0.8, 1.0, 0.6667)))
  }

  test("all-distinct doc scores zero repetition") {
    // 4 bigrams, each unique -> top 1/4.
    val got = profile(3L -> "one two three four five")
    assert(got(3L) == ((5L, 0.0, 0.25, 0.0)))
  }

  test("short docs: gram-free sizes fall back to 0.0, not NULL or NaN") {
    // One token: no bigrams/trigrams. Two tokens: one bigram (top frac 1.0
    // by convention: the single bigram IS the most frequent), no trigrams.
    val got = profile(1L -> "solo", 2L -> "two tokens")
    assert(got(1L) == ((1L, 0.0, 0.0, 0.0)))
    assert(got(2L) == ((2L, 0.0, 1.0, 0.0)))
  }

  test("normalization collapses case and whitespace before counting") {
    // "The  THE the" -> 3 tokens, 1 distinct.
    val got = profile(9L -> "The  THE   the")
    assert(got(9L)._1 == 3L && got(9L)._2 == 0.6667)
  }
}
