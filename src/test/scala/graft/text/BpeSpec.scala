package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class BpeSpec extends AnyFunSuite with SparkTestBase {

  test("hand-worked merges on the classic low/lower corpus") {
    import spark.implicits._
    val docs = Seq("low low low lower").toDF("text")
    val got = Bpe.learnMerges(docs, "text", rounds = 3)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).sortBy(_._1).toSeq
    // r1: (l,o) and (o,w) both 4 → lexicographic → (l,o).
    // r2: (lo,w)=4. r3: (low,e)=1 vs (e,r)=1 → 'e' < 'low' → (e,r).
    assert(got == Seq(
      (1, "l", "o", "lo", 4L),
      (2, "lo", "w", "low", 4L),
      (3, "e", "r", "er", 1L)))
  }

  test("a round with no pairs left is a no-op, not an annihilation") {
    import spark.implicits._
    // Every word is "ab": after round 1 every word is one symbol and
    // rounds 2–3 have an empty argmax — the merge must no-op (the old
    // crossJoin emptied the symbol table, losing the learned "ab" piece
    // for every downstream consumer).
    val docs = Seq("ab ab ab").toDF("text")
    assert(Bpe.learnMerges(docs, "text", rounds = 3).count() == 1L)
    val counts = Bpe.tokenCounts(docs.withColumn("doc_id", lit(0L)),
      "doc_id", "text", rounds = 3).collect().head
    assert(counts.getAs[Long]("n_words") == 3L)
    assert(counts.getAs[Long]("n_tokens") == 3L) // "ab" stays one piece
  }

  test("greedy merge consumes overlaps once: aaa merges to [aa, a]") {
    import spark.implicits._
    val out = Seq(Tuple1(Seq("a", "a", "a"))).toDF("s")
      .select(Bpe.applyMerge(col("s"), lit("a"), lit("a")).as("m"))
      .as[Seq[String]].head()
    assert(out == Seq("aa", "a"))
    // And a merge in the middle leaves flanks alone.
    val mid = Seq(Tuple1(Seq("x", "a", "b", "y"))).toDF("s")
      .select(Bpe.applyMerge(col("s"), lit("a"), lit("b")).as("m"))
      .as[Seq[String]].head()
    assert(mid == Seq("x", "ab", "y"))
  }

  test("tokenCounts: merged words shrink, unmergeable words stay at char count") {
    import spark.implicits._
    // Corpus dominated by "ab": merge 1 = (a,b). Doc 2's "cd" never merges
    // in round 1 and has no 'ab' pairs.
    val docs = Seq((1L, "ab ab ab"), (2L, "cd")).toDF("doc_id", "text")
    val got = Bpe.tokenCounts(docs, "doc_id", "text", rounds = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(1L) == ((3L, 3L)))  // three words, each "ab" → 1 token
    assert(got(2L) == ((1L, 2L)))  // "cd" stays c,d
  }

  test("fertility: per-group tokens/word and chars/token, hand-computed") {
    import spark.implicits._
    // Same 1-round corpus as the tokenCounts case, split across two
    // groups: merge 1 = (a,b). Group en: 3×"ab" → 3 words, 3 tokens,
    // 6 chars → fertility 1.0, chars/token 2.0. Group de: "cd" unmerged
    // → 1 word, 2 tokens, 2 chars → fertility 2.0, chars/token 1.0.
    val docs = Seq(("en", "ab ab ab"), ("de", "cd")).toDF("lang", "text")
    val got = Bpe.fertility(docs, "lang", "text", rounds = 1)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5)))).toMap
    assert(got("en") == ((3L, 3L, 6L, 1.0, 2.0)))
    assert(got("de") == ((1L, 2L, 2L, 2.0, 1.0)))
  }

  test("byte-level: merges are hex-pair symbols; multi-byte UTF-8 splits per byte") {
    import spark.implicits._
    // "ab" 3x: bytes 61,62 -> top merge (61,62) with count 3.
    val docs = Seq("ab ab ab", "cd").toDF("text")
    val m = Bpe.learnMergesBytes(docs, "text", rounds = 1).head
    assert((m.getString(1), m.getString(2), m.getString(3), m.getLong(4)) ==
      (("61", "62", "6162", 3L)))
  }

  test("byte fallback: arbitrary UTF-8 tokenizes with zero UNK") {
    import spark.implicits._
    // Corpus: ASCII plus CJK, emoji, and combining accents — words the
    // CHARACTER alphabet would have to treat atomically. Byte-level must
    // segment every one into base-or-merged symbols whose decoded bytes
    // re-concatenate to the original word: the no-UNK guarantee.
    val docs = Seq((1L, "hello hello 世界"), (2L, "café 😀 naïve")).toDF("doc_id", "text")
    val got = Bpe.tokenCountsBytes(docs, "doc_id", "text", rounds = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // Every word tokenized (no drops): doc 1 has 3 words, doc 2 has 3.
    assert(got(1L)._1 == 3L && got(2L)._1 == 3L)
    // Tokens never exceed bytes (fallback ceiling) and the merged corpus
    // sits strictly below it (merges fired on the repeated ASCII).
    assert(got(1L)._2 <= got(1L)._3 && got(2L)._2 <= got(2L)._3)
    assert(got(1L)._2 < got(1L)._3, s"no merge fired: ${got(1L)}")
    // Byte accounting is real UTF-8: CJK chars are 3 bytes each.
    // doc 1: "hello"(5+5) + 2 CJK chars x 3 bytes = 16.
    assert(got(1L)._3 == 16L, s"utf8 bytes: ${got(1L)._3}")
  }

  test("pair counts weight by word frequency, not document layout") {
    import spark.implicits._
    // Same words split across documents/partitions — same merges.
    val a = Seq("ab ab", "ab cd").toDF("text")
    val b = Seq("ab", "ab", "ab", "cd").toDF("text").repartition(3)
    val ma = Bpe.learnMerges(a, "text", 2).collect().map(_.toSeq).toSeq
    val mb = Bpe.learnMerges(b, "text", 2).collect().map(_.toSeq).toSeq
    assert(ma == mb)
  }
}
