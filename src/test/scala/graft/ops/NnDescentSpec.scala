package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NnDescentSpec extends AnyFunSuite with SparkTestBase {

  // Deterministic clustered fixture: 240 vectors in 16 clusters of 15,
  // dims 12 — one-hot cluster axis (2.0) plus hash-free arithmetic noise
  // so every run (and every partitioning) builds the identical corpus.
  private def clustered(n: Int = 240, clusters: Int = 16, dims: Int = 12) = {
    import spark.implicits._
    (0 until n).map { i =>
      val c = i % clusters
      val v = Array.tabulate(dims) { d =>
        val noise = (((i * 31 + d * 7) % 11) - 5) / 20.0f
        (if (d == c % dims) 2.0f else 0.0f) + noise
      }
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  private def edgeSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("recall >= 0.9 against brute kNN on the clustered corpus") {
    val corpus = clustered()
    val got = NnDescent.knnGraph(corpus, "vec_id", "embedding",
      k = 5, rounds = 6)
    val truth = Similarity.bruteForceTopK(corpus, corpus,
      "vec_id", "embedding", k = 5)
    val g = edgeSet(got)
    val t = edgeSet(truth)
    val recall = (g intersect t).size.toDouble / t.size
    assert(recall >= 0.9, s"recall $recall")
    // Every node ranked exactly k edges.
    assert(got.count() == truth.count())
  }

  test("one init bucket covering the corpus degenerates to exact brute") {
    // initBucketSize >= n puts every vector in one bucket per table: the
    // init scores ALL pairs, so even zero rounds must equal brute truth.
    val corpus = clustered(n = 60, clusters = 6)
    val got = NnDescent.knnGraph(corpus, "vec_id", "embedding",
      k = 4, rounds = 0, initBucketSize = 100)
    val truth = Similarity.bruteForceTopK(corpus, corpus,
      "vec_id", "embedding", k = 4)
    assert(edgeSet(got) == edgeSet(truth))
  }

  test("deterministic and partition-invariant") {
    val corpus = clustered(n = 120, clusters = 8)
    def run(df: org.apache.spark.sql.DataFrame) =
      NnDescent.knnGraph(df, "vec_id", "embedding", k = 3, rounds = 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
        .sortBy(x => (x._1, x._3)).toSeq
    assert(run(corpus) == run(corpus.repartition(7)))
  }

  test("simPrecision quantizes the ranking key, ties broken by id") {
    val corpus = clustered(n = 60, clusters = 6)
    val got = NnDescent.knnGraph(corpus, "vec_id", "embedding",
      k = 3, rounds = 2, simPrecision = 6)
    // cos column carries the quantized value (<= 6 decimals).
    got.select("cos").collect().map(_.getDouble(0)).foreach { c =>
      assert(math.abs(c * 1e6 - math.rint(c * 1e6)) < 1e-6, c)
    }
  }

  test("empty and singleton inputs yield empty graphs") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(NnDescent.knnGraph(empty, "vec_id", "embedding",
      k = 3, rounds = 2).count() == 0)
    val one = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    assert(NnDescent.knnGraph(one, "vec_id", "embedding",
      k = 3, rounds = 2).count() == 0)
    val withNull = Seq((1L, Array(1.0f)), (2L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding")
    assert(NnDescent.knnGraph(withNull, "vec_id", "embedding",
      k = 3, rounds = 2).count() == 0) // lone non-null vector: no pairs
  }

  test("mergeArrivals bulk and incremental shapes produce identical rows") {
    import spark.implicits._
    // Edges: ids 1 and 2 hold ranked lists (k = 2); id 3 exists only in
    // arrivals; id 2 receives nothing (the pass-through case the bulk
    // re-rank must reproduce bit-for-bit, flags cleared).
    val edges = Seq(
      (1L, 10L, 0.9, false), (1L, 11L, 0.8, true),
      (2L, 20L, 0.7, false), (2L, 21L, 0.6, true)
    ).toDF("id", "nbr", "cos", "__new")
    val arrivals = Seq(
      (1L, 12L, 0.95), // genuine arrival, should evict 11
      (1L, 10L, 0.9),  // re-score of a known edge: stays old (__o max)
      (3L, 30L, 0.5)   // brand-new id
    ).toDF("id", "nbr", "cos")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "nbr", "cos", "__new").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getBoolean(3))).toSet
    val inc = rows(NnDescent.mergeArrivals(edges, arrivals, k = 2,
      bulk = false))
    val blk = rows(NnDescent.mergeArrivals(edges, arrivals, k = 2,
      bulk = true))
    assert(blk === inc)
    // The pass-through id keeps both rows with flags cleared; the
    // arrival-receiving id keeps top-2 with only the genuine arrival
    // flagged new.
    assert(blk === Set((1L, 12L, 0.95, true), (1L, 10L, 0.9, false),
      (2L, 20L, 0.7, false), (2L, 21L, 0.6, false),
      (3L, 30L, 0.5, true)))
  }

  test("SemDedup keepFlagsFromPairs shadows the larger id of a tau-edge") {
    import spark.implicits._
    val ids = Seq(1L, 2L, 3L, 4L).toDF("id")
    val pairs = Seq((1L, 3L, 0.95), (4L, 2L, 0.99), (1L, 2L, 0.10))
      .toDF("a", "b", "sim")
    val kept = SemDedup.keepFlagsFromPairs(ids, "id", pairs,
      "a", "b", "sim", tau = 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // 3 loses to 1; 4 loses to 2 (direction irrelevant); the 0.10 pair
    // never shadows.
    assert(kept == Map(1L -> true, 2L -> true, 3L -> false, 4L -> false))
  }
}
