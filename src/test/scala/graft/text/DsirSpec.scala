package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class DsirSpec extends AnyFunSuite with SparkTestBase {

  // Two disjoint vocabularies: docs 1-2 speak "alpha beta gamma",
  // docs 3-4 speak "delta epsilon zeta"; doc 5 has one token (no bigrams).
  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "alpha beta gamma alpha beta", "wiki"),
      (2L, "beta gamma alpha beta gamma", "wiki"),
      (3L, "delta epsilon zeta delta epsilon", "web"),
      (4L, "epsilon zeta delta epsilon zeta", "web"),
      (5L, "solo", "web")
    ).toDF("doc_id", "text", "source")
  }

  test("target = whole corpus gives exactly zero log-weights") {
    // pt and pr are the same rational numbers, so every term is an exact
    // 0.0 — not merely a small float.
    val got = Dsir.importanceWeights(corpus, "doc_id", "text",
        isTarget = lit(true), buckets = 64)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq.sortBy(_._1)
    assert(got.map(_._1) == Seq(1L, 2L, 3L, 4L)) // doc 5: no bigrams
    assert(got.forall(_._2 == 0.0))
  }

  test("disjoint-vocabulary target separates signs") {
    val got = Dsir.importanceWeights(corpus, "doc_id", "text",
        isTarget = col("source") === "wiki", buckets = 1024)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toMap
    // Target-vocabulary docs look MORE likely under the target
    // distribution, off-target docs less (1024 buckets ≫ 8 distinct
    // bigrams, so cross-vocabulary collisions are absent here).
    assert(got(1L) > 0.0 && got(2L) > 0.0)
    assert(got(3L) < 0.0 && got(4L) < 0.0)
  }

  test("n_feats counts bigram occurrences") {
    val got = Dsir.importanceWeights(corpus, "doc_id", "text",
        isTarget = col("source") === "wiki")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 4L, 2L -> 4L, 3L -> 4L, 4L -> 4L))
  }

  test("weights are partition-invariant (bucket-ordered fold)") {
    val a = Dsir.importanceWeights(corpus, "doc_id", "text",
        isTarget = col("source") === "wiki")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq.sortBy(_._1)
    val b = Dsir.importanceWeights(corpus.repartition(7), "doc_id", "text",
        isTarget = col("source") === "wiki")
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq.sortBy(_._1)
    assert(a == b)
  }
}
