package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class ReconcileSpec extends AnyFunSuite with SparkTestBase {

  test("classifies added / removed / changed; identical rows are silent") {
    import spark.implicits._
    val a = Seq(
      (1L, "x", 10.0), (2L, "y", 20.0), (3L, "z", 30.0), (4L, "w", 40.0))
      .toDF("k", "s", "v")
    val b = Seq(
      (1L, "x", 10.0),          // unchanged
      (2L, "y", 21.0),          // changed value
      (4L, "W", 40.0),          // changed string
      (5L, "new", 50.0))        // added; 3 removed
      .toDF("k", "s", "v")
    val out = Reconcile.snapshotDiff(a, b, Seq("k"))
      .as[(Long, String)].collect().toSet
    assert(out == Set((2L, "changed"), (3L, "removed"),
      (4L, "changed"), (5L, "added")))
  }

  test("null vs empty string and column boundaries are distinguished") {
    import spark.implicits._
    val a = Seq((1L, Option.empty[String], "x"), (2L, Option("ab"), ""))
      .toDF("k", "s1", "s2")
    val bSame = Seq((1L, Option.empty[String], "x"), (2L, Option("ab"), ""))
      .toDF("k", "s1", "s2")
    assert(Reconcile.snapshotDiff(a, bSame, Seq("k")).count() == 0)
    // null → "" flips row 1; boundary shift "ab"/"" → "a"/"b" flips row 2.
    val bDiff = Seq((1L, Option(""), "x"), (2L, Option("a"), "b"))
      .toDF("k", "s1", "s2")
    val out = Reconcile.snapshotDiff(a, bDiff, Seq("k"))
      .as[(Long, String)].collect().toSet
    assert(out == Set((1L, "changed"), (2L, "changed")))
  }

  test("separator characters inside values cannot alias across columns") {
    import spark.implicits._
    // Under a separator-based concat these two rows encode identically;
    // the per-cell digest scheme must see them as changed.
    val a = Seq((1L, "x\u0001y", "z")).toDF("k", "s1", "s2")
    val b = Seq((1L, "x", "y\u0001z")).toDF("k", "s1", "s2")
    val out = Reconcile.snapshotDiff(a, b, Seq("k"))
      .as[(Long, String)].collect().toSet
    assert(out == Set((1L, "changed")))
    // And a literal NUL string is distinct from NULL.
    val c = Seq((1L, Option("\u0000"), "z")).toDF("k", "s1", "s2")
    val d = Seq((1L, Option.empty[String], "z")).toDF("k", "s1", "s2")
    assert(Reconcile.snapshotDiff(c, d, Seq("k"))
      .as[(Long, String)].collect().toSet == Set((1L, "changed")))
  }

  test("mismatched schemas are rejected") {
    import spark.implicits._
    val a = Seq((1L, "x")).toDF("k", "s")
    val b = Seq((1L, "x", 1.0)).toDF("k", "s", "v")
    intercept[IllegalArgumentException](Reconcile.snapshotDiff(a, b, Seq("k")))
  }
}
