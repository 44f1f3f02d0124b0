package graft.text

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class WordPieceSpec extends AnyFunSuite with SparkTestBase {

  private def docs(texts: String*) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("likelihood argmax beats raw frequency when a pair is exclusive") {
    // "xy" appears 4 times and x/y appear NOWHERE else (score 4/(4·4));
    // "ab" appears 5 times but a and b are everywhere (a also in "az"
    // ×10, b in "bz" ×10 → score 5/(15·15)). Frequency argmax would
    // merge (a,b); likelihood merges (x,y).
    val d = docs(
      Seq.fill(4)("xy").mkString(" "),
      Seq.fill(5)("ab").mkString(" "),
      Seq.fill(10)("az").mkString(" "),
      Seq.fill(10)("bz").mkString(" "))
    val m = WordPiece.learnMerges(d, "text", rounds = 1).collect().head
    assert((m.getAs[String]("left"), m.getAs[String]("right")) == ("x", "y"))
    assert(m.getAs[Long]("pair_count") == 4L)
    assert(m.getAs[Long]("left_count") == 4L &&
      m.getAs[Long]("right_count") == 4L)
  }

  test("longest match wins over a shorter prefix piece") {
    // Corpus makes (a,b) then (ab,c) merge: vocab gains "ab" and "abc".
    // The word "abcd" must tokenize abc|d (2 tokens), not ab|c|d.
    val d = docs(Seq.fill(20)("abc").mkString(" ") + " abcd")
    val counts = WordPiece.tokenCounts(d, "doc_id", "text", rounds = 2)
      .collect().head
    // words: "abc" ×20 (1 token each) + "abcd" (abc|d = 2 tokens)
    assert(counts.getAs[Long]("n_words") == 21L)
    assert(counts.getAs[Long]("n_tokens") == 20L + 2L)
  }

  test("alphabet fallback: every in-corpus word tokenizes") {
    val d = docs("qu qu qu quiz zap", "mixed bag of words zap")
    val out = WordPiece.tokenCounts(d, "doc_id", "text", rounds = 3)
      .collect()
    val total = out.map(_.getAs[Long]("n_words")).sum
    // All 10 words ≤ 12 chars → every one must appear in some doc count.
    assert(total == 10L)
    out.foreach(r =>
      assert(r.getAs[Long]("n_tokens") >= r.getAs[Long]("n_words")))
  }

  test("a round with no pairs left is a no-op, not an annihilation") {
    // Every word is "ab": round 1 merges (a,b) and every word becomes
    // ONE symbol; rounds 2–3 find zero pairs. The empty argmax must
    // leave the symbol table intact (the old crossJoin emptied it,
    // collapsing the vocabulary to the bare alphabet).
    val d = docs("ab ab ab ab")
    val merges = WordPiece.learnMerges(d, "text", rounds = 3).collect()
    assert(merges.length == 1) // only the real merge is learned
    val counts = WordPiece.tokenCounts(d, "doc_id", "text", rounds = 3)
      .collect().head
    // "ab" must still tokenize as the single merged piece, not a|b.
    assert(counts.getAs[Long]("n_words") == 4L)
    assert(counts.getAs[Long]("n_tokens") == 4L)
  }

  test("words beyond the cap are out of model on both sides") {
    val d = docs("short supercalifragilistic short")
    val c = WordPiece.tokenCounts(d, "doc_id", "text", rounds = 1, cap = 12)
      .collect().head
    assert(c.getAs[Long]("n_words") == 2L) // the 20-char word is dropped
  }

  test("rounds past the Int-shift range still tokenize (1L bound, not 1 << rounds)") {
    // With `1 << rounds` (Int shift, mod 32) rounds = 32 wraps to 1 and
    // only single-char pieces would ever match. Merges exhaust after a
    // couple of rounds on this corpus, so the extra rounds are no-ops
    // and the counts must equal the rounds = 3 result.
    val d = docs("xy xy xy ab")
    val want = WordPiece.tokenCounts(d, "doc_id", "text", rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = WordPiece.tokenCounts(d, "doc_id", "text", rounds = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }
}
