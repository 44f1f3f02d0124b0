package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class RobustStatsSpec extends AnyFunSuite with SparkTestBase {

  private def df(rows: Seq[(String, Long, Long)]) = {
    import spark.implicits._
    rows.toDF("grp", "v", "id").repartition(3)
  }

  private def run(rows: Seq[(String, Long, Long)], trim: Double) =
    RobustStats.trimmedStats(df(rows), Seq("grp"), "v", Seq("id"), trim)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(5), r.getDouble(6))))
      .toMap

  test("hand-computed trim: k=1 drops one value from each end") {
    // sorted: 1 2 3 4 100 — k = floor(0.2*5) = 1; trimmed mean of
    // (2,3,4) = 3; winsorized: clamp 1->2 and 100->4 -> (2+2+3+4+4)/5 = 3
    val got = run(Seq(("a", 100L, 5L), ("a", 3L, 3L), ("a", 1L, 1L),
      ("a", 4L, 4L), ("a", 2L, 2L)), trim = 0.2)
    assert(got("a") == ((5L, 1L, 3.0, 3.0)))
  }

  test("outlier leverage is capped vs the plain mean") {
    // plain mean of (1,2,3,4,1000000) is ~200002; trimmed/winsor stay small
    val got = run(Seq(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L),
      ("a", 4L, 4L), ("a", 1000000L, 5L)), trim = 0.2)
    val (_, _, tm, wm) = got("a")
    assert(tm == 3.0)
    assert(wm == (2.0 + 2 + 3 + 4 + 4) / 5)
  }

  test("trim=0 degenerates to the plain mean on both estimators") {
    val got = run(Seq(("a", 10L, 1L), ("a", 20L, 2L), ("a", 60L, 3L)),
      trim = 0.0)
    assert(got("a") == ((3L, 0L, 30.0, 30.0)))
  }

  test("boundary ties cut by the tie-break column, not arbitrarily") {
    // values 5,5,5,9 with ids 1..4; k=1: the DROPPED low value is the
    // (5,id=1) row and hi is (9,id=4); survivors (5,id=2),(5,id=3);
    // clamps are 5 and 5 -> winsor = (5+5+5+5)/4 = 5
    val got = run(Seq(("a", 5L, 1L), ("a", 5L, 2L), ("a", 5L, 3L),
      ("a", 9L, 4L)), trim = 0.25)
    assert(got("a") == ((4L, 1L, 5.0, 5.0)))
  }

  test("groups trim independently and singletons survive") {
    val got = run(Seq(("a", 7L, 1L),
      ("b", 1L, 1L), ("b", 2L, 2L), ("b", 3L, 3L), ("b", 4L, 4L),
      ("b", 5L, 5L)), trim = 0.2)
    assert(got("a") == ((1L, 0L, 7.0, 7.0)))
    assert(got("b") == ((5L, 1L, 3.0, 3.0)))
  }

  test("result is partitioning-invariant") {
    val rows = (1L to 97L).map(i => ("g" + (i % 3), (i * 37) % 101, i))
    val a = RobustStats.trimmedStats(df(rows), Seq("grp"), "v", Seq("id"), 0.1)
      .collect().map(_.toSeq).toSet
    val b = RobustStats.trimmedStats(
        df(rows).repartition(7), Seq("grp"), "v", Seq("id"), 0.1)
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("empty input yields an empty frame with the full schema") {
    val out = RobustStats.trimmedStats(df(Nil), Seq("grp"), "v", Seq("id"), 0.1)
    assert(out.columns.toSeq == Seq("grp", "n_rows", "trim_k",
      "lo_clamp", "hi_clamp", "trimmed_mean", "winsor_mean"))
    assert(out.count() == 0)
  }

  test("null group keys survive as their own group") {
    import spark.implicits._
    val rows = Seq((Some("a"), 1L, 1L), (Some("a"), 3L, 2L),
      (None, 10L, 3L), (None, 20L, 4L), (None, 60L, 5L))
      .toDF("grp", "v", "id").repartition(3)
    val got = RobustStats.trimmedStats(rows, Seq("grp"), "v", Seq("id"), 0.1)
      .collect()
      .map(r => Option(r.getString(0)) -> ((r.getLong(1), r.getDouble(5))))
      .toMap
    assert(got(Some("a")) == ((2L, 2.0)))
    assert(got(None) == ((3L, 30.0)))
  }

  test("null VALUES are excluded before counting and ranking") {
    import spark.implicits._
    // With the null counted, n=4/k=1 would trim a real value on one
    // engine and the null on another (null sort order differs); the
    // estimators are over the non-null set: n=3, k=0, mean 2.0.
    val rows = Seq(("a", Some(1L), 1L), ("a", Some(2L), 2L),
      ("a", Some(3L), 3L), ("a", None, 4L))
      .toDF("grp", "v", "id").repartition(3)
    val got = RobustStats.trimmedStats(rows, Seq("grp"), "v", Seq("id"), 0.25)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(5),
        r.getDouble(6))).head
    assert(got == ((3L, 0L, 2.0, 2.0)))
  }

  test("trim bounds are validated") {
    intercept[IllegalArgumentException] {
      RobustStats.trimmedStats(df(Nil), Seq("grp"), "v", Seq("id"), 0.5)
    }
    intercept[IllegalArgumentException] {
      RobustStats.trimmedStats(df(Nil), Seq("grp"), "v", Seq("id"), -0.1)
    }
  }
}
