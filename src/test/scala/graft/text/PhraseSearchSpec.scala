package graft.text

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class PhraseSearchSpec extends AnyFunSuite with SparkTestBase {

  private def search(phrases: Seq[String], rows: (Long, String)*) = {
    import spark.implicits._
    InvertedIndex.phraseSearch(rows.toDF("doc_id", "text"), "doc_id", "text",
        phrases)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
  }

  test("counts every occurrence, including at document boundaries") {
    val out = search(Seq("quick brown fox"),
      1L -> "quick brown fox jumps then quick brown fox again",
      2L -> "ends with quick brown fox",
      3L -> "no match here at all")
    assert(out === Map(("quick brown fox", 1L) -> 2L,
      ("quick brown fox", 2L) -> 1L))
  }

  test("overlapping occurrences all count") {
    val out = search(Seq("na na"), 1L -> "na na na na")
    assert(out === Map(("na na", 1L) -> 3L))
  }

  test("single-term phrases degrade to term frequency") {
    val out = search(Seq("spark"), 1L -> "spark core spark sql spark")
    assert(out === Map(("spark", 1L) -> 3L))
  }

  test("adjacency is required — scattered terms do not match") {
    val out = search(Seq("hash join"), 1L -> "hash partition then sort join")
    assert(out.isEmpty)
  }

  test("multiple phrases report independently with normalization applied") {
    val out = search(Seq("big table", "small scan"),
      1L -> "Big   TABLE holds a small scan",
      2L -> "small scan only")
    assert(out === Map(
      ("big table", 1L) -> 1L,
      ("small scan", 1L) -> 1L,
      ("small scan", 2L) -> 1L))
  }
}
