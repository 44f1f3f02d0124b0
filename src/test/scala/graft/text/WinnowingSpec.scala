package graft.text

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class WinnowingSpec extends AnyFunSuite with SparkTestBase {

  test("the winnowing guarantee: shared substring of length >= w+k-1 shares a fingerprint") {
    import spark.implicits._
    val shared = "this exact phrase is lifted verbatim from the source document"
    val docs = Seq(
      (1L, s"opening words before. $shared and then it diverges entirely"),
      (2L, s"unrelated preamble text here $shared closing with other words"),
      (3L, "nothing in common with either of the documents above at all")
    ).toDF("doc_id", "text")
    val pairs = Winnowing.overlapPairs(docs, "doc_id", "text", k = 8, w = 4,
      minShared = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("fingerprint density sits near the 2/(w+1) expectation") {
    import spark.implicits._
    val text = (1 to 200).map(i => s"w${i}x").mkString(" ")
    val prof = Winnowing.profile(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text", k = 8, w = 4).head()
    val (grams, fps) = (prof.getLong(1), prof.getLong(2))
    val density = fps.toDouble / grams
    assert(density > 0.2 && density < 0.6, s"density=$density")
  }

  test("short docs drop out; fingerprints are partition-invariant") {
    import spark.implicits._
    val docs = Seq((1L, "tiny"), (2L, "long enough text to fingerprint properly"))
      .toDF("doc_id", "text")
    val prof = Winnowing.profile(docs, "doc_id", "text").collect()
    assert(prof.map(_.getLong(0)).toSet == Set(2L))
    val a = Winnowing.fingerprints(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Winnowing.fingerprints(docs.repartition(5), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }
}
