package graft.ops

import java.nio.file.Files

import graft.SparkTestBase
import graft.streaming.StreamingGraphMaintenance
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Tombstone deletes + compaction repair on the persisted kNN graph:
  * a delete must mask BOTH edge endpoints without writing a generation,
  * replayed/never-stored deletes must be no-ops, [[GraphIndex.compact]]
  * must fold the mask into a fresh generation whose hole lists REFILL
  * to the survivors' exact graph, and a maintenance batch must fold
  * pending tombstones — making delete→add an update path.
  *
  * Fixture: 6 clusters of 8 nodes over one-hot axes (within-cluster
  * cosine ~0.99, cross ~0) with k = 5 — every node's true top-5 is 5 of
  * its 7 cluster-mates, so "repaired == exact brute over survivors" is
  * a checkable equality, and deleting 2 of a cluster's 8 leaves its 6
  * survivors still able to refill entirely within the cluster.
  */
class GraphIndexDeleteSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val K = 5

  private def vec(i: Long, c: Int): Array[Double] =
    Array.tabulate(6)(d =>
      (if (d == c) 4.0 else 0.0) + (((i * 31 + d * 7) % 11) - 5) / 40.0)

  private def vec(i: Long): Array[Double] = vec(i, (i % 6).toInt)

  private def corpusDf(ids: Seq[Long]) =
    ids.map(i => (i, vec(i))).toDF("vec_id", "embedding")

  private def edgePairs(path: String): Set[(Long, Long)] =
    GraphIndex.edges(spark, path).select("id", "nbr")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def brutePairs(ids: Seq[Long]): Set[(Long, Long)] =
    Similarity.bruteForceTopK(corpusDf(ids), corpusDf(ids),
        "vec_id", "embedding", k = K)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private val all = 0L until 48L

  test("delete masks both endpoints without a new generation; replayed " +
    "and never-stored deletes append nothing") {
    val path = Files.createTempDirectory("gidx_del").toString
    GraphIndex.write(spark, path, corpusDf(all), "vec_id", "embedding",
      k = K, rounds = 8, simPrecision = 6)
    val v1 = GraphIndex.liveVersion(spark, path)
    val dead = Seq(0L, 6L) // two members of cluster 0
    GraphIndex.delete(spark, path, dead.toDF("vec_id"), "vec_id")
    assert(GraphIndex.liveVersion(spark, path) == v1,
      "delete must not write a generation")
    val nodeIds = GraphIndex.nodes(spark, path).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(dead.forall(!nodeIds.contains(_)))
    val e = edgePairs(path)
    assert(!e.exists { case (a, b) => dead.contains(a) || dead.contains(b) },
      "a deleted id survived as an edge endpoint")
    def tombRows() = spark.read.parquet(s"$path/$v1/tombstones").count()
    val t1 = tombRows()
    GraphIndex.delete(spark, path, dead.toDF("vec_id"), "vec_id") // replay
    GraphIndex.delete(spark, path, Seq(999L).toDF("vec_id"), "vec_id")
    assert(tombRows() == t1, "replayed/never-stored delete appended")
    assert(edgePairs(path) == e)
  }

  test("compact folds the mask and repairs holes to the survivors' " +
    "exact graph; re-compact is a no-op") {
    val path = Files.createTempDirectory("gidx_cpt").toString
    GraphIndex.write(spark, path, corpusDf(all), "vec_id", "embedding",
      k = K, rounds = 8, simPrecision = 6)
    val dead = Seq(0L, 6L)
    val survivors = all.filterNot(dead.contains)
    GraphIndex.delete(spark, path, dead.toDF("vec_id"), "vec_id")
    GraphIndex.compact(spark, path, k = K, rounds = 8, simPrecision = 6)
    val v2 = GraphIndex.liveVersion(spark, path)
    // Physically folded: raw trees hold no deleted row, no tombstones.
    val rawIds = spark.read.parquet(s"$path/$v2/nodes").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(rawIds == survivors.toSet)
    assert(!new java.io.File(s"$path/$v2/tombstones").exists())
    // Repaired: cluster 0's six survivors lost list members and must
    // refill — the whole graph equals exact brute over survivors.
    assert(edgePairs(path) == brutePairs(survivors))
    GraphIndex.compact(spark, path, k = K, rounds = 8, simPrecision = 6)
    assert(GraphIndex.liveVersion(spark, path) == v2,
      "compact with no tombstones wrote a generation")
  }

  test("a maintenance batch folds pending tombstones: delete then add " +
    "of the same id is an update") {
    val path = Files.createTempDirectory("gidx_upd").toString
    GraphIndex.write(spark, path, corpusDf(all), "vec_id", "embedding",
      k = K, rounds = 8, simPrecision = 6)
    // Move id 7 (cluster 1) to cluster 2.
    GraphIndex.delete(spark, path, Seq(7L).toDF("vec_id"), "vec_id")
    GraphIndex.applyMaintenanceBatch(spark, path,
      Seq((7L, vec(7L, 2))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", k = K, rounds = 8, simPrecision = 6)
    val v = GraphIndex.liveVersion(spark, path)
    assert(!new java.io.File(s"$path/$v/tombstones").exists(),
      "maintenance did not fold the tombstones")
    val nbrs7 = GraphIndex.edges(spark, path).filter(col("id") === 7L)
      .select("nbr").collect().map(_.getLong(0)).toSet
    assert(nbrs7.nonEmpty && nbrs7.forall(_ % 6 == 2),
      s"updated id 7 should neighbor cluster 2, got $nbrs7")
  }

  test("streaming sink with opCol: deletes honored, full-batch replay " +
    "is a no-op") {
    val path = Files.createTempDirectory("gidx_sink").toString
    GraphIndex.write(spark, path, corpusDf(all), "vec_id", "embedding",
      k = K, rounds = 8, simPrecision = 6)
    val w = StreamingGraphMaintenance.writer(path, "vec_id", "embedding",
      k = K, rounds = 8, simPrecision = 6, opCol = Some("op"))
    val batch = Seq((0L, vec(0L), "delete"), (48L, vec(48L), "add"))
      .toDF("vec_id", "embedding", "op")
    w(batch, 0L)
    val v = GraphIndex.liveVersion(spark, path)
    val e = edgePairs(path)
    assert(!e.exists { case (a, b) => a == 0L || b == 0L })
    val nbrs48 = e.filter(_._1 == 48L).map(_._2)
    assert(nbrs48.nonEmpty && nbrs48.forall(_ % 6 == 0),
      s"added id 48 should neighbor cluster 0, got $nbrs48")
    w(batch, 0L) // crash-replay of the whole batch
    assert(GraphIndex.liveVersion(spark, path) == v,
      "replayed delete+add batch wrote a generation")
    assert(edgePairs(path) == e)
  }
}
