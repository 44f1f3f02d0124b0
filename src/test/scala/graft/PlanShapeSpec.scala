package graft

import graft.graph.PageRank
import graft.text.{HashedLinear, InvertedIndex}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape audits for the round's new operators: the physical plan is
  * part of the contract (a correct result through the wrong plan fails at
  * 100 TB), so the shapes argued in the Scaladoc are asserted here.
  */
class PlanShapeSpec extends AnyFunSuite with SparkTestBase {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("HashedLinear: weight join broadcasts; no sort-merge anywhere") {
    import spark.implicits._
    val docs = (0L until 100L).map(i => (i, s"a b c d$i")).toDF("id", "text")
    val plan = planOf(HashedLinear.score(docs, "id", "text",
      HashedLinear.syntheticWeights(spark, 4096), 4096))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("PageRank iteration: partial aggregation on the contribution sum") {
    import spark.implicits._
    val edges = (0L until 64L).map(i => (i, (i * 7 + 1) % 64)).toDF("s", "d")
    val plan = planOf(PageRank.ranks(edges, "s", "d", 1))
    // The dst-keyed contribution sum must be map-side combined: a
    // partial_sum before the exchange, final after.
    assert(plan.contains("partial_sum"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("InvertedIndex: both aggregations partial; posting sort is per-row") {
    import spark.implicits._
    val docs = (0L until 100L).map(i => (i, s"x y z${i % 5}")).toDF("id", "text")
    val plan = planOf(InvertedIndex.build(docs, "id", "text"))
    assert(plan.contains("partial_count"), plan)
    // No global Sort node: ordering lives inside sort_array per row.
    assert(!plan.split('\n').exists(l => l.trim.startsWith("Sort ")), plan)
  }

  test("media sniff is a single map-only projection over the scan") {
    import spark.implicits._
    val df = Seq(Tuple1("RIFFxxxxWAVE".getBytes("US-ASCII"))).toDF("b")
      .select(graft.multimodal.Multimodal.sniffMime(col("b")).as("mime"))
    val plan = planOf(df)
    assert(!plan.contains("Exchange"), plan)
  }
}
