package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class OrdinalsSpec extends AnyFunSuite with SparkTestBase {

  test("tiled ordinals equal the global-window row_number on every row") {
    import spark.implicits._
    val rows = (0 until 500).map(i => ((i * 131) % 499, s"k$i"))
    val df = rows.toDF("v", "k")
    val tiled = Ordinals.assign(df, Seq(col("v").desc, col("k").asc),
      partitions = 7)
      .select("k", "ordinal").as[(String, Long)].collect().toMap
    val global = rows.sortBy { case (v, k) => (-v, k) }
      .zipWithIndex.map { case ((_, k), i) => k -> i.toLong }.toMap
    assert(tiled == global)
  }

  test("no single-partition exchange in the plan") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i, s"k$i")).toDF("v", "k")
    val plan = Ordinals.assign(df, Seq(col("v").asc, col("k").asc))
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan)
    assert(!plan.contains("SinglePartition"), plan)
  }

  test("empty input yields empty output") {
    import spark.implicits._
    val e = Seq.empty[(Int, String)].toDF("v", "k")
    assert(Ordinals.assign(e, Seq(col("v").asc)).count() == 0)
  }
}
