package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class SemDedupSpec extends AnyFunSuite with SparkTestBase {

  private def fixtures = {
    import spark.implicits._
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(2.0f, 0.0f)),  // parallel to 1 → cosine 1.0
      (3L, Array(0.0f, 1.0f)),  // orthogonal → survives
      (4L, Array(1.0f, 0.0f))   // duplicate direction but OTHER cluster
    ).toDF("vec_id", "embedding")
    val clusters = Seq((1L, 0), (2L, 0), (3L, 0), (4L, 1))
      .toDF("vec_id", "cluster")
    (emb, clusters)
  }

  test("prunes within clusters only; keep-first by id") {
    val (emb, clusters) = fixtures
    val got = SemDedup.keepFlags(emb, "vec_id", "embedding", clusters, 0.9)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(2)))
      .sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, 0, true),   // lowest id in its duplicate pair
      (2L, 0, false),  // shadowed by 1
      (3L, 0, true),   // orthogonal
      (4L, 1, true)))  // same direction as 1 but never compared
  }

  test("tau above every similarity keeps everything") {
    val (emb, clusters) = fixtures
    val got = SemDedup.keepFlags(emb, "vec_id", "embedding", clusters, 1.5)
      .collect().map(_.getBoolean(2))
    assert(got.length == 4 && got.forall(identity))
  }

  test("deterministic under repartitioning") {
    val (emb, clusters) = fixtures
    val a = SemDedup.keepFlags(emb, "vec_id", "embedding", clusters, 0.9)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).sortBy(_._1).toSeq
    val b = SemDedup.keepFlags(emb.repartition(5), "vec_id", "embedding",
        clusters.repartition(3), 0.9)
      .collect().map(r => (r.getLong(0), r.getBoolean(2))).sortBy(_._1).toSeq
    assert(a == b)
  }
}
