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
}
