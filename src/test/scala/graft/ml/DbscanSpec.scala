package graft.ml

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class DbscanSpec extends AnyFunSuite with SparkTestBase {

  private def run(points: Seq[Long], pairs: Seq[(Long, Long)], minPts: Int) = {
    import spark.implicits._
    Dbscan.cluster(points.toDF("id").repartition(3),
        pairs.toDF("a", "b").repartition(2), "id", "a", "b", minPts)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))))
      .toMap
  }

  private def clique(ids: Seq[Long]): Seq[(Long, Long)] =
    for { a <- ids; b <- ids if a < b } yield (a, b)

  test("two dense blobs, a border hanger-on, chained and isolated noise") {
    // Blob 1-4 and blob 10-13 (4-cliques: degree 3, so core at minPts=4);
    // 5 hangs off core 1 (border -> cluster 1); 6 hangs off non-core 5
    // (no core neighbor -> noise); 7 has no pairs at all (noise).
    val got = run(
      points = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 10L, 11L, 12L, 13L),
      pairs = clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(10L, 11L, 12L, 13L))
        ++ Seq((1L, 5L), (5L, 6L)),
      minPts = 4)
    Seq(1L, 2L, 3L, 4L).foreach(i => assert(got(i) == (("core", 1L)), s"$i"))
    Seq(10L, 11L, 12L, 13L).foreach(i =>
      assert(got(i) == (("core", 10L)), s"$i"))
    assert(got(5L) == (("border", 1L)))
    assert(got(6L) == (("noise", -1L)))
    assert(got(7L) == (("noise", -1L)))
  }

  test("a star center is core purely via border neighbors and seeds " +
      "its own cluster") {
    // Center 20 has 3 leaf neighbors (degree 3 -> core at minPts=4);
    // leaves are non-core but core-adjacent -> border in cluster 20.
    val got = run(points = Seq(20L, 21L, 22L, 23L),
      pairs = Seq((20L, 21L), (20L, 22L), (20L, 23L)), minPts = 4)
    assert(got(20L) == (("core", 20L)))
    Seq(21L, 22L, 23L).foreach(i => assert(got(i) == (("border", 20L)), s"$i"))
  }

  test("a border between two clusters attaches to the MIN cluster id, " +
      "and does NOT merge them (it is not core)") {
    // 50 touches both blobs but has degree 2 (+1 = 3 < minPts 4), so it
    // cannot density-connect them — the classic DBSCAN bridge case.
    val got = run(points = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 13L, 50L),
      pairs = clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(10L, 11L, 12L, 13L))
        ++ Seq((4L, 50L), (10L, 50L)),
      minPts = 4)
    assert(got(4L) == (("core", 1L)) && got(10L) == (("core", 10L)))
    assert(got(50L) == (("border", 1L)))
  }

  test("minPts=1 makes every point core, including fully isolated ones") {
    val got = run(points = Seq(1L, 2L, 9L), pairs = Seq((1L, 2L)), minPts = 1)
    assert(got(1L) == (("core", 1L)))
    assert(got(2L) == (("core", 1L)))
    assert(got(9L) == (("core", 9L))) // |N_eps| = 1 (itself) >= 1
  }

  test("result is partitioning-invariant") {
    val points = (1L to 120L)
    val pairs = points.flatMap(i =>
      Seq(i -> (i + 3), i -> (i + 7)).filter(_._2 <= 120L))
    val a = run(points, pairs, minPts = 4)
    import spark.implicits._
    val b = Dbscan.cluster(points.toDF("id").repartition(11),
        pairs.toDF("a", "b").repartition(13), "id", "a", "b", 4)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))))
      .toMap
    assert(a == b)
  }

  test("empty pairs: everything is noise (or core when minPts=1)") {
    val got = run(points = Seq(1L, 2L), pairs = Nil, minPts = 2)
    assert(got(1L) == (("noise", -1L)) && got(2L) == (("noise", -1L)))
  }
}
