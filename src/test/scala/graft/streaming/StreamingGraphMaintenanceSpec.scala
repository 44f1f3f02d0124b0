package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import graft.ops.{GraphIndex, Similarity}
import org.scalatest.funsuite.AnyFunSuite

/** Streaming kNN-graph maintenance: a stream of adds applied through the
  * foreachBatch sink must CONVERGE to the same graph a from-scratch
  * batch build over the full corpus does, and replays must be no-ops
  * (no new generation, identical edges).
  *
  * Fixture makes "same graph" checkable exactly: 12 clusters of k+1
  * nodes, so every node's true top-k IS its k cluster-mates — any path
  * that converges yields the one exact graph, which is also asserted
  * against brute force directly (if either path fell short of exact,
  * the equivalence assert would be vacuous).
  */
class StreamingGraphMaintenanceSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val K = 5

  // 12 clusters over 12 one-hot axes (4.0) + small arithmetic noise:
  // within-cluster cosine ~0.99, cross ~0 — unambiguous neighborhoods.
  private def vec(i: Long): Array[Double] = {
    val c = (i % 12).toInt
    Array.tabulate(12)(d =>
      (if (d == c) 4.0 else 0.0) + (((i * 31 + d * 7) % 11) - 5) / 40.0)
  }

  private def corpusDf(ids: Seq[Long]) =
    ids.map(i => (i, vec(i))).toDF("vec_id", "embedding")

  private def edgePairs(path: String): Set[(Long, Long)] =
    GraphIndex.edges(spark, path).select("id", "nbr")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("stream-built graph == batch rebuild after convergence; replay is a no-op") {
    val all = 0L until 72L // 12 clusters × 6 = K+1 nodes each
    val path = Files.createTempDirectory("graft_graph_stream").toString

    // Generation 1: the first 48 nodes (each cluster at 4 members).
    GraphIndex.write(spark, path, corpusDf(0L until 48L),
      "vec_id", "embedding", k = K, rounds = 8, simPrecision = 6)

    val w = StreamingGraphMaintenance.writer(path, "vec_id", "embedding",
      k = K, rounds = 8, simPrecision = 6)
    // Batch 1 holds same-cluster pairs (exercises the in-batch bucket
    // init), plus an in-batch duplicate of id 50.
    val b1 = corpusDf((48L until 66L) :+ 50L)
    // Batch 2 finishes the corpus and redelivers id 50 cross-batch —
    // must be dropped, not stitched twice.
    val b2 = corpusDf((66L until 72L) :+ 50L)
    w(b1, 0L)
    w(b2, 1L)

    val streamed = edgePairs(path)
    val liveAfter = GraphIndex.liveVersion(spark, path)

    // Exactness: every node's list is exactly its 5 cluster-mates.
    val truth = Similarity.bruteForceTopK(corpusDf(all), corpusDf(all),
        "vec_id", "embedding", k = K)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == truth,
      s"missing=${(truth -- streamed).take(5)} extra=${(streamed -- truth).take(5)}")

    // Equivalence: a from-scratch batch build converges to the same graph.
    val ref = Files.createTempDirectory("graft_graph_ref").toString
    GraphIndex.write(spark, ref, corpusDf(all),
      "vec_id", "embedding", k = K, rounds = 8, simPrecision = 6)
    assert(edgePairs(ref) == streamed)

    // Replay batch 2 (crash before the stream checkpoint advanced):
    // every id is already stored → no new generation, identical edges.
    w(b2, 1L)
    assert(GraphIndex.liveVersion(spark, path) == liveAfter,
      "replayed batch wrote a new generation")
    assert(edgePairs(path) == streamed)
  }

  test("empty and all-duplicate batches write no generation") {
    val path = Files.createTempDirectory("graft_graph_noop").toString
    GraphIndex.write(spark, path, corpusDf(0L until 24L),
      "vec_id", "embedding", k = K, rounds = 6, simPrecision = 6)
    val v1 = GraphIndex.liveVersion(spark, path)
    val w = StreamingGraphMaintenance.writer(path, "vec_id", "embedding",
      k = K, rounds = 6, simPrecision = 6)
    w(corpusDf(Seq.empty), 0L)
    w(corpusDf(Seq(3L, 7L)), 1L) // both already stored
    assert(GraphIndex.liveVersion(spark, path) == v1)
  }

  test("a maintenance batch leaves no checkpoint blocks behind") {
    import org.apache.spark.storage.StorageLevel
    def live() = spark.sparkContext.getPersistentRDDs.values
      .count(_.getStorageLevel != StorageLevel.NONE)
    val path = Files.createTempDirectory("graft_graph_leak").toString
    GraphIndex.write(spark, path, corpusDf(0L until 36L),
      "vec_id", "embedding", k = K, rounds = 4, simPrecision = 6)
    val before = live()
    GraphIndex.applyMaintenanceBatch(spark, path,
      corpusDf(36L until 48L), "vec_id", "embedding",
      k = K, rounds = 2, simPrecision = 6)
    // Everything the batch pinned — stored/fresh/vAll/refined, the seed
    // walk's final beam, the in-batch init's final edges, the overlay's
    // Ordinals pin — is released before return: a long-running stream
    // must not grow one block set per micro-batch until GC.
    val after = live()
    assert(after - before <= 0, s"leaked ${after - before} block sets")
  }
}
