package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class BloomJoinSpec extends AnyFunSuite with SparkTestBase {

  test("bloom-prefiltered join equals the plain join exactly") {
    import spark.implicits._
    val big = (0L until 2000L).map(i => (i % 500, s"fact$i")).toDF("k", "f")
    val small = Seq((3L, "a"), (77L, "b"), (499L, "c"), (9999L, "never"))
      .toDF("k", "d")
    val got = BloomJoin.filteredJoin(big, small, Seq("k"),
      expectedItems = 100L)
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    val want = big.join(small, Seq("k"))
      .collect().map(_.toSeq).sortBy(_.mkString("|")).toSeq
    assert(got == want && got.nonEmpty)
  }

  test("the plan carries might_contain ahead of the join") {
    import spark.implicits._
    // A parquet-backed big side: over a LOCAL relation the optimizer
    // constant-folds the bloom probe away entirely (which is fine — but
    // invisible to this audit).
    val dir = java.nio.file.Files.createTempDirectory("bloomjoin").toString
    (0L until 100L).map(i => (i, i.toString)).toDF("k", "f")
      .write.mode("overwrite").parquet(dir)
    val big = spark.read.parquet(dir)
    val small = Seq((1L, "x")).toDF("k", "d")
    val plan = BloomJoin.filteredJoin(big, small, Seq("k"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
  }

  test("multi-column keys and empty small side") {
    import spark.implicits._
    val big = (0L until 50L).map(i => (i % 5, i % 3, i)).toDF("a", "b", "v")
    val small = Seq((1L, 2L, "dim")).toDF("a", "b", "d")
    val got = BloomJoin.filteredJoin(big, small, Seq("a", "b"))
    val want = big.join(small, Seq("a", "b"))
    assert(got.collect().map(_.toSeq).toSet == want.collect().map(_.toSeq).toSet)
    val none = small.filter("a < 0")
    assert(BloomJoin.filteredJoin(big, none, Seq("a", "b")).count() == 0)
  }
}
