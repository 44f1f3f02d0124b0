package graft.graph

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PageRankSpec extends AnyFunSuite with SparkTestBase {

  private def ranksMap(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    import spark.implicits._
    PageRank.ranks(edges.toDF("src", "dst"), "src", "dst", iters)
      .as[(Long, Long)].collect().toMap
  }

  test("hand-computed 3-node graph, one iteration") {
    // 1→2, 1→3, 2→1; node 3 dangling. N=3, base = 1e12 div 3.
    val base = 333333333333L
    val r = ranksMap(Seq((1L, 2L), (1L, 3L), (2L, 1L)), iters = 1)
    // c(1) = r0(2) div 1 = base; c(2) = c(3) = r0(1) div 2.
    val half = base / 2
    assert(r(1L) == (15 * base + 85 * base) / 100)
    assert(r(2L) == (15 * base + 85 * half) / 100)
    assert(r(3L) == r(2L))
    assert(r(1L) == base) // (15b + 85b)/100 == b exactly at this base
  }

  test("zero iterations is the uniform base; dangling mass leaks after") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)) // 4 is a sink
    val r0 = ranksMap(edges, 0)
    assert(r0.values.toSet == Set(1_000_000_000_000L / 4))
    // Sink keeps receiving but never emits: total mass strictly decreases.
    val r2 = ranksMap(edges, 2)
    assert(r2.values.sum < r0.values.sum)
    assert(r2.keySet == Set(1L, 2L, 3L, 4L))
  }

  test("a hub with more in-links outranks leaf nodes (star graph)") {
    // 1..5 all point at 9; 9 points at 1.
    val edges = (1L to 5L).map(i => (i, 9L)) :+ ((9L, 1L))
    val r = ranksMap(edges, 3)
    assert(r(9L) > r(1L))
    assert((2L to 5L).forall(i => r(9L) > r(i)))
  }

  test("multi-edges weigh once per edge row; self-loops are honored") {
    // Double edge 1→2 vs single 1→3 via out-degree 3.
    val r = ranksMap(Seq((1L, 2L), (1L, 2L), (1L, 3L)), 1)
    assert(r(2L) > r(3L))
    val self = ranksMap(Seq((1L, 1L)), 2)
    assert(self(1L) > 0)
  }

  test("iteration matches an independent driver-side fixed-point model") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 0L), (0L, 2L), (3L, 0L))
    val n = 4L
    val base = PageRank.Scale / n
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var model = Map(0L -> base, 1L -> base, 2L -> base, 3L -> base)
    (1 to 3).foreach { _ =>
      val c = edges.groupBy(_._2).view.mapValues(
        _.map { case (u, _) => model(u) / deg(u) }.sum).toMap
      model = model.keys.map(v => v -> (15 * base + 85 * c.getOrElse(v, 0L)) / 100).toMap
    }
    assert(ranksMap(edges, 3) == model)
  }

  test("string node ids work (any orderable key type)") {
    import spark.implicits._
    val df = Seq(("a", "b"), ("b", "a")).toDF("s", "d")
    val out = PageRank.ranks(df, "s", "d", 2)
      .orderBy("node").as[(String, Long)].collect()
    assert(out.map(_._1).toSeq == Seq("a", "b"))
    assert(out(0)._2 == out(1)._2) // symmetric 2-cycle stays uniform
  }

  test("personalized: mass stays near the seed, decays with distance") {
    import spark.implicits._
    // Chain 0→1→2→3 plus a disconnected 2-cycle 8↔9.
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (8L, 9L), (9L, 8L))
      .toDF("s", "d")
    // Enough rounds to mix: early iterations carry the initial mass as a
    // transient wave down the chain (node k spikes at iteration k).
    val got = PageRank.personalized(edges, "s", "d", Seq(0L), 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Seed keeps the teleport floor; downstream decays geometrically
    // (~0.85 per hop at steady state); the component unreachable from
    // the seed holds zero mass.
    assert(got(0L) > got(1L) && got(1L) > got(2L) && got(2L) > got(3L))
    assert(got(8L) == 0L && got(9L) == 0L)
    assert(got(0L) == 15L * PageRank.Scale / 100L) // no in-edges: pure teleport
  }

  test("personalized hand-stepped recurrence on a 2-seed graph") {
    import spark.implicits._
    val edges = Seq((0L, 2L), (1L, 2L), (2L, 0L)).toDF("s", "d")
    val base = PageRank.Scale / 2
    val deg = Map(0L -> 1L, 1L -> 1L, 2L -> 1L)
    var model = Map(0L -> base, 1L -> base, 2L -> 0L)
    val seeds = Set(0L, 1L)
    (1 to 3).foreach { _ =>
      val c = Map(
        2L -> (model(0L) / deg(0L) + model(1L) / deg(1L)),
        0L -> model(2L) / deg(2L))
      model = Seq(0L, 1L, 2L).map(v => v ->
        ((if (seeds(v)) 15 * base else 0L) + 85 * c.getOrElse(v, 0L)) / 100)
        .toMap
    }
    val got = PageRank.personalized(edges, "s", "d", Seq(0L, 1L), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == model)
  }

  test("personalized: duplicate seed entries do not halve the teleport " +
      "mass") {
    import spark.implicits._
    val edges = Seq((0L, 1L), (1L, 0L)).toDF("s", "d")
    val once = PageRank.personalized(edges, "s", "d", Seq(0L), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val duped = PageRank.personalized(edges, "s", "d", Seq(0L, 0L), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(duped == once)
  }
}
