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
