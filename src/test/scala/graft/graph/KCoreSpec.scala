package graft.graph

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class KCoreSpec extends AnyFunSuite with SparkTestBase {

  private def run(edges: Seq[(Long, Long)], k: Int, rounds: Int): Map[Long, Long] = {
    import spark.implicits._
    KCore.peel(edges.toDF("src", "dst"), "src", "dst", k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("K4 with a pendant chain: the chain peels away, the clique stays") {
    val k4 = for { a <- 0L to 3L; b <- 0L to 3L if a < b } yield (a, b)
    // Chain hangs off node 3; node 9 even touches two chain nodes.
    val chain = Seq((3L, 8L), (8L, 9L), (9L, 10L))
    val got = run(k4 ++ chain, k = 3, rounds = 3)
    assert(got == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("cascading peel needs multiple rounds: a chain into the core") {
    // Triangle + chain where each peel exposes the next victim.
    val tri = Seq((0L, 1L), (1L, 2L), (0L, 2L))
    val chain = Seq((2L, 3L), (3L, 4L), (4L, 5L))
    val r1 = run(tri ++ chain, k = 2, rounds = 1)
    val r3 = run(tri ++ chain, k = 2, rounds = 3)
    // Round 1 peels the leaf AND the output's >= k gate hides the newly
    // exposed node 4; by round three the whole chain is gone.
    assert(r1.keySet == Set(0L, 1L, 2L, 3L))
    assert(r3.keySet == Set(0L, 1L, 2L))
    // Converged: extra rounds change nothing.
    assert(run(tri ++ chain, k = 2, rounds = 5) == r3)
  }

  test("per-round checkpoints are released, not accumulated") {
    import spark.implicits._
    val tri = Seq((0L, 1L), (1L, 2L), (0L, 2L))
    val chain = Seq((2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L))
    val before = spark.sparkContext.getPersistentRDDs.size
    KCore.peel((tri ++ chain).toDF("src", "dst"), "src", "dst",
      k = 2, rounds = 8).collect()
    val after = spark.sparkContext.getPersistentRDDs.size
    // Only the LAST intermediate checkpoint (the final round's input) may
    // stay live — never one block set per round.
    assert(after - before <= 1, s"leaked ${after - before} checkpoints")
  }

  test("a graph below the threshold empties completely") {
    assert(run(Seq((0L, 1L), (1L, 2L)), k = 2, rounds = 3).isEmpty)
  }
}
