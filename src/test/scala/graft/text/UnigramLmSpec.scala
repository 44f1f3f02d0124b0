package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class UnigramLmSpec extends AnyFunSuite with SparkTestBase {

  test("viterbi picks the higher-scoring segmentation") {
    val scores = Map("ab" -> -1.0, "a" -> -2.0, "b" -> -2.0, "c" -> -5.0)
    // "ab"+"c" = -6 beats "a"+"b"+"c" = -9.
    assert(UnigramLm.viterbi("abc", scores, 4) == List("ab", "c"))
  }

  test("viterbi tie prefers the longer final piece") {
    val scores = Map("ab" -> -4.0, "a" -> -2.0, "b" -> -2.0)
    assert(UnigramLm.viterbi("ab", scores, 4) == List("ab"))
  }

  test("viterbi segments unknown characters via the fallback") {
    assert(UnigramLm.viterbi("xz", Map("q" -> -1.0), 4) == List("x", "z"))
    assert(UnigramLm.viterbi("", Map.empty, 4) == Nil)
  }

  test("seed keeps all single chars and only full-length substrings") {
    import spark.implicits._
    val words = Seq(("ab", 3L), ("b", 2L)).toDF("word", "wcnt")
    val seed = UnigramLm.seedCounts(words, maxPieceLen = 4, seedSize = 10)
    // Substrings of "ab": a, b, ab (each ×3); of "b": b (×2).
    assert(seed == Map("a" -> 3L, "b" -> 5L, "ab" -> 3L))
  }

  test("fit learns the dominant word as a piece; tokenCounts uses it") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hello world hello"),
      (2L, "hello hello hello"),
      (3L, "world of hello")
    ).toDF("doc_id", "text")
    val model = UnigramLm.fit(docs, "text",
      maxPieceLen = 6, seedSize = 50, vocabSize = 10, emRounds = 2)
    // The whole words are frequent full-length substrings -> pieces.
    assert(model.counts.contains("hello"))
    assert(model.counts("hello") == 6L)
    // Token counts: every "hello"/"world" segments to 1 piece, "of" too
    // (it is a top substring at this tiny scale); counts per doc = words.
    val got = UnigramLm.tokenCounts(docs, "doc_id", "text", model)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(2L) == 3L) // three one-piece words
    assert(got(1L) == 3L)
    assert(got(3L) == 3L)
  }

  test("fit is deterministic under repartition") {
    import spark.implicits._
    val rows = (0 until 60).map(i =>
      (i.toLong, s"alpha bravo charlie t${i % 7} alpha bravo"))
    val a = UnigramLm.fit(rows.toDF("doc_id", "text"), "text",
      maxPieceLen = 5, seedSize = 30, vocabSize = 8, emRounds = 2)
    val b = UnigramLm.fit(rows.toDF("doc_id", "text").repartition(7), "text",
      maxPieceLen = 5, seedSize = 30, vocabSize = 8, emRounds = 2)
    assert(a == b)
  }

  test("property: viterbi matches brute-force optimal segmentation") {
    val rnd = new scala.util.Random(11)
    val alphabet = "abc"
    def allSegmentations(w: String): Seq[List[String]] =
      if (w.isEmpty) Seq(Nil)
      else (1 to w.length).flatMap(k =>
        allSegmentations(w.drop(k)).map(w.take(k) :: _))
    for (_ <- 1 to 60) {
      val w = (0 until 1 + rnd.nextInt(7))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      // Random vocab over all substrings; single chars always present.
      val subs = (for {
        i <- 0 until w.length; j <- i + 1 to w.length
      } yield w.substring(i, j)).distinct
      val scores = subs
        .filter(p => p.length == 1 || rnd.nextBoolean())
        .map(p => p -> -(1.0 + rnd.nextInt(100))).toMap ++
        alphabet.map(c => c.toString -> -50.0).toMap
      val got = UnigramLm.viterbi(w, scores, maxPieceLen = w.length.max(1))
      val gotScore = got.map(scores).sum
      val best = allSegmentations(w)
        .filter(_.forall(scores.contains))
        .map(seg => seg.map(scores).sum)
        .max
      assert(gotScore == best, s"w=$w got=$got ($gotScore vs $best)")
    }
  }

  test("vocabulary reports integer usage that covers the corpus words") {
    import spark.implicits._
    val docs = Seq((1L, "aa aa ab")).toDF("doc_id", "text")
    val model = UnigramLm.fit(docs, "text",
      maxPieceLen = 2, seedSize = 10, vocabSize = 4, emRounds = 1)
    val vocab = UnigramLm.vocabulary(docs, "text", model)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // "aa" appears twice as a word; the piece "aa" covers both.
    assert(vocab.getOrElse("aa", 0L) >= 2L)
    assert(vocab.values.forall(_ > 0L))
  }
}
