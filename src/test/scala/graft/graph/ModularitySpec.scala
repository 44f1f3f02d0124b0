package graft.graph

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class ModularitySpec extends AnyFunSuite with SparkTestBase {

  private def run(edges: Seq[(Long, Long)],
      labels: Seq[(Long, Long)]): Map[Long, (Long, Long, Long)] = {
    import spark.implicits._
    Modularity.perCommunity(edges.toDF("src", "dst"), "src", "dst",
        labels.toDF("node", "label"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("two cliques joined by one bridge: hand-computed numerators") {
    // Triangles {0,1,2} and {3,4,5}, bridge 2-3. m = 7.
    val tri1 = Seq((0L, 1L), (1L, 2L), (0L, 2L))
    val tri2 = Seq((3L, 4L), (4L, 5L), (3L, 5L))
    val edges = tri1 ++ tri2 ++ Seq((2L, 3L))
    val labels = Seq(0L -> 10L, 1L -> 10L, 2L -> 10L,
      3L -> 20L, 4L -> 20L, 5L -> 20L)
    val got = run(edges, labels)
    // Community 10: e_intra = 3, d_total = 2+2+3 = 7 → 4*7*3 - 49 = 35.
    assert(got(10L) == ((3L, 7L, 35L)))
    assert(got(20L) == ((3L, 7L, 35L)))
    // Q = (35 + 35) / (4 * 49) = 70/196 ≈ 0.357 — positive, good split.
    assert(got.values.map(_._3).sum > 0)
  }

  test("everything in one community scores zero") {
    // Q = e/m - (2m/2m)^2 = 1 - 1 = 0 exactly.
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L))
    val labels = Seq(0L, 1L, 2L, 3L).map(_ -> 99L)
    val got = run(edges, labels)
    assert(got.keySet == Set(99L))
    val (e, d, q) = got(99L)
    assert(e == 4L && d == 8L && q == 0L)
  }

  test("anti-community labeling scores negative") {
    // Bipartite-ish: cut every edge with the labeling.
    val edges = Seq((0L, 1L), (2L, 3L), (0L, 3L), (1L, 2L))
    val labels = Seq(0L -> 1L, 2L -> 1L, 1L -> 2L, 3L -> 2L)
    assert(run(edges, labels).values.map(_._3).sum < 0)
  }

  test("duplicate and reversed edges dedup; unlabeled nodes drop") {
    val edges = Seq((0L, 1L), (1L, 0L), (0L, 1L), (1L, 7L))
    val labels = Seq(0L -> 5L, 1L -> 5L) // node 7 unlabeled
    val got = run(edges, labels)
    assert(got(5L) == ((1L, 2L, 0L))) // m=1: 4*1*1 - 4 = 0
  }
}
