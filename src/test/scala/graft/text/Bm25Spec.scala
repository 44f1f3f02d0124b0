package graft.text

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class Bm25Spec extends AnyFunSuite with SparkTestBase {

  private def scores(docs: Seq[(Long, String)], terms: Seq[String]) = {
    import spark.implicits._
    Bm25.termScores(docs.toDF("doc_id", "text"), "doc_id", "text", terms)
      .as[(Long, String, Double)].collect()
      .groupBy(r => (r._1, r._2)).view.mapValues(_.head._3).toMap
  }

  test("ranking properties: tf saturation, length penalty, rarity reward") {
    val s = scores(Seq(
      (1L, "hash join"),                    // tf(hash)=1, dl=2
      (2L, "hash hash join"),               // tf(hash)=2, dl=3
      (3L, "hash join pad pad pad pad"),    // tf(hash)=1, dl=6 (longer)
      (4L, "join join")), Seq("hash", "join"))
    // More occurrences → higher score (same term, comparable docs).
    assert(s((2L, "hash")) > s((1L, "hash")))
    // Longer document → lower score at equal tf.
    assert(s((3L, "hash")) < s((1L, "hash")))
    // Rarer term (hash in 3/4 docs) outscores ubiquitous one (join in 4/4)
    // at equal tf within the same doc.
    assert(s((1L, "hash")) > s((1L, "join")))
    // Absent (doc, term) pairs produce no row at all.
    assert(!s.contains((4L, "hash")))
  }

  test("docs without query terms are absent; empty corpus yields empty") {
    import spark.implicits._
    val s = scores(Seq((1L, "nothing relevant"), (2L, "hash")), Seq("hash"))
    assert(s.keySet == Set((2L, "hash")))
    assert(Bm25.termScores(Seq.empty[(Long, String)].toDF("doc_id", "text"),
      "doc_id", "text", Seq("hash")).count() == 0)
  }
}
