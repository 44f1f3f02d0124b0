package graft.graph

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class LabelPropagationSpec extends AnyFunSuite with SparkTestBase {

  private def run(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
    import spark.implicits._
    LabelPropagation.communities(edges.toDF("src", "dst"), "src", "dst", rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two cliques joined by one bridge resolve to two communities") {
    val cliqueA = for { a <- 0L to 3L; b <- 0L to 3L if a < b } yield (a, b)
    val cliqueB = for { a <- 10L to 13L; b <- 10L to 13L if a < b } yield (a, b)
    val got = run(cliqueA ++ cliqueB :+ (3L -> 10L), rounds = 3)
    // Min-label ties pull each clique to its smallest member.
    assert((0L to 3L).map(got).toSet.size == 1)
    assert((10L to 13L).map(got).toSet.size == 1)
    assert(got(0L) != got(11L))
  }

  test("round 0 is the identity labelling") {
    val got = run(Seq((1L, 2L), (2L, 3L)), rounds = 0)
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("per-round label checkpoints are released, not accumulated") {
    import spark.implicits._
    val path = (0L until 12L).sliding(2).map(p => (p(0), p(1))).toSeq
    val before = spark.sparkContext.getPersistentRDDs.size
    LabelPropagation.communities(path.toDF("src", "dst"), "src", "dst",
      rounds = 8).collect()
    val after = spark.sparkContext.getPersistentRDDs.size
    // Live by design: nbrs, nodes, and the final round's input labels —
    // a rounds-independent constant, never one label table per round.
    assert(after - before <= 3, s"leaked ${after - before} checkpoints")
  }

  test("synchronous single round on a path votes with min-label tie-breaks") {
    // 1-2-3: every node's neighbors vote once each; ties -> smallest.
    // 1 sees {2}; 2 sees {1,3} tie -> 1; 3 sees {2}.
    assert(run(Seq((1L, 2L), (2L, 3L)), rounds = 1) ==
      Map(1L -> 2L, 2L -> 1L, 3L -> 2L))
  }

  test("deterministic under repartitioning") {
    import spark.implicits._
    val edges = (0L until 120L).map(i => (i, (i * 7 + 1) % 40))
    val df = edges.toDF("src", "dst")
    val a = LabelPropagation.communities(df, "src", "dst", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = LabelPropagation.communities(df.repartition(13), "src", "dst", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a == b)
  }
}
