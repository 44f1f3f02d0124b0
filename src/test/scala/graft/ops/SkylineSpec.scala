package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkylineSpec extends AnyFunSuite with SparkTestBase {

  private def pts(rows: (Long, Long, Long)*): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "d1", "d2")
  }

  private def naive(d: DataFrame): Set[Long] = {
    val rows = d.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.filter { case (_, x1, x2) =>
      !rows.exists { case (_, y1, y2) =>
        y1 >= x1 && y2 >= x2 && (y1 > x1 || y2 > x2)
      }
    }.map(_._1).toSet
  }

  private def front(d: DataFrame): Set[Long] =
    Skyline.front2d(d, "d1", "d2").select(col("id"))
      .collect().map(_.getLong(0)).toSet

  test("matches the naive dominance definition on a mixed cloud") {
    val d = pts((1L to 60L).map(i =>
      (i, (i * 37) % 23, (i * 53) % 29)): _*)
    assert(front(d) === naive(d))
  }

  test("staircase: every step is on the front") {
    val d = pts((1L, 10L, 1L), (2L, 8L, 3L), (3L, 5L, 7L), (4L, 1L, 9L))
    assert(front(d) === Set(1L, 2L, 3L, 4L))
  }

  test("equal points survive together; strictly dominated points drop") {
    val d = pts((1L, 5L, 5L), (2L, 5L, 5L), (3L, 4L, 5L), (4L, 5L, 4L),
      (5L, 3L, 3L))
    assert(front(d) === Set(1L, 2L))
  }

  test("single point is its own front; empty input stays empty") {
    assert(front(pts((9L, 0L, 0L))) === Set(9L))
    assert(front(pts()) === Set.empty[Long])
  }

  test("front is partitioning-invariant") {
    val d = pts((1L to 200L).map(i =>
      (i, (i * 17) % 101, (i * 41) % 97)): _*)
    assert(front(d.repartition(17)) === front(d.repartition(1)))
  }

  // ---- d-dimensional SFS path ----

  private def pts3(rows: (Long, Long, Long, Long)*): DataFrame = {
    import spark.implicits._
    rows.toDF("id", "d1", "d2", "d3")
  }

  private def naive3(d: DataFrame): Set[Long] = {
    val rows = d.collect().map(r =>
      (r.getLong(0), Seq(r.getLong(1), r.getLong(2), r.getLong(3))))
    rows.filter { case (_, x) =>
      !rows.exists { case (_, y) =>
        x.indices.forall(i => y(i) >= x(i)) &&
          x.indices.exists(i => y(i) > x(i))
      }
    }.map(_._1).toSet
  }

  private def front3(d: DataFrame): Set[Long] =
    Skyline.front(d, Seq("d1", "d2", "d3")).select(col("id"))
      .collect().map(_.getLong(0)).toSet

  test("3d front matches the naive dominance definition") {
    val d = pts3((1L to 120L).map(i =>
      (i, (i * 37) % 23, (i * 53) % 29, (i * 71) % 31)): _*)
    assert(front3(d) === naive3(d))
  }

  test("3d: equal vectors survive together; dominated rows drop") {
    val d = pts3((1L, 5L, 5L, 5L), (2L, 5L, 5L, 5L), (3L, 5L, 5L, 4L),
      (4L, 6L, 1L, 1L), (5L, 1L, 1L, 1L))
    assert(front3(d) === Set(1L, 2L, 4L))
  }

  test("3d front is partitioning-invariant") {
    val d = pts3((1L to 300L).map(i =>
      (i, (i * 17) % 101, (i * 41) % 97, (i * 13) % 89)): _*)
    assert(front3(d.repartition(23)) === front3(d.repartition(1)))
  }

  test("3d: null-dimension rows are dropped, not ranked") {
    import spark.implicits._
    val d = Seq((1L, Some(5L), Some(5L), Some(5L)),
      (2L, Some(9L), None, Some(9L)),
      (3L, Some(1L), Some(1L), Some(1L)))
      .toDF("id", "d1", "d2", "d3")
    assert(front3(d) === Set(1L))
  }

  test("dims.size == 2 dispatches to the 2d sweep with identical results") {
    val d = pts((1L to 80L).map(i =>
      (i, (i * 37) % 23, (i * 53) % 29)): _*)
    val viaFront = Skyline.front(d, Seq("d1", "d2")).select(col("id"))
      .collect().map(_.getLong(0)).toSet
    assert(viaFront === front(d))
  }

  test("4d front matches naive") {
    import spark.implicits._
    val rows = (1L to 100L).map(i =>
      (i, (i * 7) % 11, (i * 13) % 17, (i * 19) % 23, (i * 29) % 13))
    val d = rows.toDF("id", "d1", "d2", "d3", "d4")
    val got = Skyline.front(d, Seq("d1", "d2", "d3", "d4")).select(col("id"))
      .collect().map(_.getLong(0)).toSet
    val all = rows.map { case (id, a, b, c, e) => (id, Seq(a, b, c, e)) }
    val want = all.filter { case (_, x) =>
      !all.exists { case (_, y) =>
        x.indices.forall(i => y(i) >= x(i)) &&
          x.indices.exists(i => y(i) > x(i))
      }
    }.map(_._1).toSet
    assert(got === want)
  }

  // ---- unionBound guard on the phase-2 finish ----

  private def naive4(rows: Seq[(Long, Long, Long, Long, Long)]): Set[Long] = {
    val all = rows.map { case (id, a, b, c, e) => (id, Seq(a, b, c, e)) }
    all.filter { case (_, x) =>
      !all.exists { case (_, y) =>
        x.indices.forall(i => y(i) >= x(i)) &&
          x.indices.exists(i => y(i) > x(i))
      }
    }.map(_._1).toSet
  }

  test("guard: extra SFS rounds bound the final-task input and keep " +
      "naive parity at two partition counts") {
    import spark.implicits._
    // Mixed cloud: large local fronts per partition, much smaller global
    // front — exactly the case where guard rounds help.
    val rows = (1L to 600L).map(i =>
      (i, (i * 7) % 211, (i * 13) % 197, (i * 19) % 223, (i * 29) % 181))
    val want = naive4(rows)
    for (parts <- Seq(4, 16)) {
      val d = rows.toDF("id", "d1", "d2", "d3", "d4").repartition(parts)
      val (res, counts) = Skyline.frontWithRounds(
        d, Seq("d1", "d2", "d3", "d4"), unionBound = 64L)
      val got = res.select(col("id")).collect().map(_.getLong(0)).toSet
      assert(got === want, s"parity at $parts partitions")
      // The guard must have engaged (phase-1 union exceeds the bound) and
      // every round must shrink the survivor set, so the final task reads
      // the LAST count, not the phase-1 union.
      assert(counts.head > 64L, s"fixture must trip the guard: $counts")
      assert(counts.size > 1, s"guard rounds must run: $counts")
      assert(counts.last < counts.head, s"rounds must shrink: $counts")
    }
  }

  test("guard: an intrinsically full front (all-equal sums) terminates " +
      "after one non-shrinking round with full parity") {
    import spark.implicits._
    // Every point sits on the simplex d1+d2+d3+d4 = 300: no point can
    // dominate another (a dominator needs a strictly larger sum), so the
    // true front IS the input and no round can shrink it.
    val rows = (1L to 300L).map { i =>
      val a = (i * 7) % 100; val b = (i * 13) % (201 - a)
      val c = (i * 19) % (301 - a - b - 100).max(1)
      (i, a, b, c, 300 - a - b - c)
    }
    val d = rows.toDF("id", "d1", "d2", "d3", "d4").repartition(8)
    val (res, counts) = Skyline.frontWithRounds(
      d, Seq("d1", "d2", "d3", "d4"), unionBound = 32L)
    val got = res.select(col("id")).collect().map(_.getLong(0)).toSet
    assert(got === rows.map(_._1).toSet)
    // Engaged, then stopped on the non-shrinking break — never spun to
    // useless extra rounds.
    assert(counts.head === 300L && counts.size <= 3, s"counts: $counts")
  }
}
