package graft.graph

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class ShortestPathsSpec extends AnyFunSuite with SparkTestBase {

  private def run(edges: Seq[(Long, Long)], source: Long,
      maxDepth: Int): Map[Long, Int] = {
    import spark.implicits._
    ShortestPaths.bfs(edges.toDF("src", "dst"), "src", "dst", source, maxDepth)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
  }

  test("chain with a shortcut: BFS takes the short way") {
    // 0→1→2→3→4 plus shortcut 0→3.
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (0L, 3L))
    assert(run(edges, 0L, 10) ==
      Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 1, 4L -> 2))
  }

  test("direction matters: upstream nodes are unreachable") {
    val edges = Seq((0L, 1L), (2L, 0L))
    assert(run(edges, 0L, 5) == Map(0L -> 0, 1L -> 1))
  }

  test("depth cap excludes the far tail; early exit below the cap") {
    val chain = (0L until 8L).map(i => (i, i + 1))
    assert(run(chain, 0L, 3).keySet == Set(0L, 1L, 2L, 3L))
    // Eccentricity 8 < cap 20 — early exit must still settle everything.
    assert(run(chain, 0L, 20) == (0 to 8).map(i => i.toLong -> i).toMap)
  }

  test("isolated source reports only itself") {
    assert(run(Seq((1L, 2L)), 0L, 4) == Map(0L -> 0))
  }

  test("cycle settles each node once at its first depth") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L))
    assert(run(edges, 0L, 9) == Map(0L -> 0, 1L -> 1, 2L -> 2))
  }
}
