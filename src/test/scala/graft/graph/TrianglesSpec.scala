package graft.graph

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class TrianglesSpec extends AnyFunSuite with SparkTestBase {

  private def count(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Triangles.perNode(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("K4 plus a pendant: 3 triangles per K4 node, 0 for the pendant") {
    // K4 on {0,1,2,3} has 4 triangles; each node sits on C(3,2)=3 of them.
    val k4 = for { a <- 0L to 3L; b <- 0L to 3L if a < b } yield (a, b)
    val got = count(k4 :+ (3L -> 9L))
    assert(got == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L, 9L -> 0L))
  }

  test("duplicates, reversals and self-loops canonicalize away") {
    val messy = Seq(
      (0L, 1L), (1L, 0L), (0L, 1L), // one edge, three spellings
      (1L, 2L), (2L, 0L),
      (2L, 2L))                     // self-loop: gone
    assert(count(messy) == Map(0L -> 1L, 1L -> 1L, 2L -> 1L))
  }

  test("a triangle-free path reports zeros for every node") {
    assert(count(Seq((0L, 1L), (1L, 2L), (2L, 3L))) ==
      Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L))
  }

  test("two triangles sharing an edge credit the shared corners twice") {
    // {0,1,2} and {0,1,3}: nodes 0,1 on 2 triangles, 2,3 on 1.
    val got = count(Seq((0L, 1L), (0L, 2L), (1L, 2L), (0L, 3L), (1L, 3L)))
    assert(got == Map(0L -> 2L, 1L -> 2L, 2L -> 1L, 3L -> 1L))
  }
}
