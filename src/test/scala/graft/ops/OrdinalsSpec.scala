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

  test("no single-partition exchange; range layout survives to the output") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i, s"k$i")).toDF("v", "k")
    val out = Ordinals.assign(df, Seq(col("v").asc, col("k").asc),
      partitions = 7)
    val plan = out.queryExecution.executedPlan.toString
    // The rangepartitioning exchange now lives INSIDE the materialized
    // localCheckpoint (lineage truncation is what makes __pid
    // single-instantiation safe — see assign's comment), so the final
    // plan string can't show it. What it must still show: the
    // row_number window keyed by the TILE id (a __pid hash exchange,
    // i.e. per-tile local windows), and never a single-partition
    // exchange (the global-window shape this operator exists to avoid).
    assert(!plan.contains("SinglePartition"), plan)
    assert(plan.contains("hashpartitioning(__pid"), plan)
  }

  test("empty input yields empty output") {
    import spark.implicits._
    val e = Seq.empty[(Int, String)].toDF("v", "k")
    assert(Ordinals.assign(e, Seq(col("v").asc)).count() == 0)
  }
}
