package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DataQualitySpec extends AnyFunSuite with SparkTestBase {

  test("profile reports rows/nulls/distincts/min/max per column") {
    import spark.implicits._
    val df = Seq(
      (1L, Option("a")), (2L, Option("b")), (3L, None), (4L, Option("a")))
      .toDF("id", "tag")
    val got = DataQuality.profile(df, Seq("id", "tag"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    assert(got("id") == ((4L, 0L, 4L, "1", "4")))
    assert(got("tag") == ((4L, 1L, 2L, "a", "b")))
  }

  test("orphans: unmatched non-null keys only") {
    import spark.implicits._
    val child = Seq((1L, "x"), (2L, "y"), (99L, "z"), (0L, "n"))
      .toDF("fk", "v")
      .withColumn("fk", when(col("v") === "n", lit(null)).otherwise(col("fk")))
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val bad = DataQuality.orphans(child, "fk", parent, "pk")
      .collect().map(_.getString(1)).toSet
    assert(bad == Set("z")) // 99 orphaned; null key exempt
  }

  test("duplicateKeys finds only multiply-occurring keys") {
    import spark.implicits._
    val df = Seq(1L, 2L, 2L, 3L, 3L, 3L).toDF("k")
    val got = DataQuality.duplicateKeys(df, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(2L -> 2L, 3L -> 3L))
  }

  test("lDiversityViolations flags homogeneous classes even when k-anonymous") {
    import spark.implicits._
    val df = Seq(
      // class (30, "a"): 3 rows but only ONE sensitive value -> violates.
      ("a", 30L, "flu"), ("a", 30L, "flu"), ("a", 30L, "flu"),
      // class (40, "b"): 3 rows, 2 sensitive values -> ok at l=2.
      ("b", 40L, "flu"), ("b", 40L, "hiv"), ("b", 40L, "flu"),
      // class (50, "c"): single row, single value -> violates.
      ("c", 50L, "hiv")
    ).toDF("zip", "age", "diag").repartition(3)
    val got = DataQuality.lDiversityViolations(df, Seq("zip", "age"),
        "diag", l = 2L)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(("a", 3L, 1L), ("c", 1L, 1L)))
    intercept[IllegalArgumentException] {
      DataQuality.lDiversityViolations(df, Seq("zip"), "diag", l = 1L)
    }
  }
}
