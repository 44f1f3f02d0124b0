package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FilteredAnnSpec extends AnyFunSuite with SparkTestBase {

  // 200 vectors, 10 labels, clustered per label so filtered neighbors
  // are unambiguous; deterministic arithmetic noise.
  private def corpus(n: Int = 200) = {
    import spark.implicits._
    (0 until n).map { i =>
      val lab = i % 10
      val v = Array.tabulate(10) { d =>
        (if (d == lab) 3.0 else 0.0) + (((i * 31 + d * 7) % 11) - 5) / 20.0
      }
      (i.toLong, lab, v)
    }.toDF("vec_id", "label", "embedding")
  }

  private def pairs(df: DataFrame): Set[(Long, Long, Int)] =
    df.select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("selective predicate routes pre-filter and is exact") {
    val c = corpus()
    val pred = col("label") === 3 // 10% ≤ threshold
    val rt = FilteredAnn.route(c, pred, 0.15)
    assert(rt.preFilter && rt.matching == 20)
    val got = FilteredAnn.topK(c.filter(col("vec_id") < 8), c,
      "vec_id", "embedding", pred, k = 4, selectivityThreshold = 0.15)
    val truth = Similarity.bruteForceTopK(c.filter(col("vec_id") < 8),
      c.filter(pred), "vec_id", "embedding", k = 4)
      .select("query_id", "neighbor_id", "rank")
    assert(pairs(got) == pairs(truth))
  }

  test("broad predicate routes post-filter; survivors all qualify and rank densely") {
    val c = corpus()
    val pred = col("label") < 8 // 80% > threshold
    assert(!FilteredAnn.route(c, pred, 0.15).preFilter)
    val got = FilteredAnn.topK(c.filter(col("vec_id") < 8), c,
      "vec_id", "embedding", pred, k = 4, selectivityThreshold = 0.15,
      numPlanes = 4, tables = 4)
    val labels = c.select(col("vec_id").as("neighbor_id"), col("label"))
    assert(got.join(labels, "neighbor_id")
      .filter(col("label") >= 8).isEmpty, "unqualified row surfaced")
    // Ranks are a dense 1..m per query after the post-filter re-rank.
    val byQ = got.groupBy("query_id")
      .agg(count(lit(1)).as("n"), max("rank").as("mx")).collect()
    byQ.foreach(r => assert(r.getLong(1) == r.getInt(2).toLong))
    assert(byQ.forall(_.getLong(1) <= 4))
  }

  test("over-fetch keeps post-filter recall high on the clustered corpus") {
    val c = corpus()
    val pred = col("label") < 5 // 50%
    val got = FilteredAnn.topK(c.filter(col("vec_id") < 20), c,
      "vec_id", "embedding", pred, k = 4, selectivityThreshold = 0.15,
      overFetch = 3.0, numPlanes = 2, tables = 4)
    val truth = Similarity.bruteForceTopK(c.filter(col("vec_id") < 20),
      c.filter(pred), "vec_id", "embedding", k = 4)
      .select("query_id", "neighbor_id")
    val g = pairs(got).map(t => (t._1, t._2))
    val t = truth.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (g intersect t).size.toDouble / t.size
    // The bound tracks the UNDERLYING LSH's recall on this corpus (the
    // filter logic itself loses nothing — the survivors-qualify test
    // above pins that); the full recall/knob surface is measured in
    // tools/AnnCurves, not asserted here.
    assert(recall >= 0.7, s"recall $recall")
  }

  test("plan: selective branch is the partial top-k aggregation, never a corpus window") {
    val c = corpus()
    val plan = FilteredAnn.topK(c.filter(col("vec_id") < 8), c,
        "vec_id", "embedding", col("label") === 3, k = 4,
        selectivityThreshold = 0.15)
      .queryExecution.executedPlan.toString
    // The pre-filter branch rides bruteForceTopKAgg: probes broadcast,
    // the per-query reduction is a PARTIAL aggregate before its exchange
    // (O(partitions·k) shuffled rows), and nothing funnels to one task.
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("partial_topkaggregator") ||
      plan.contains("TopKAggregator"), plan)
    assert(!plan.contains("Exchange SinglePartition"), plan)
  }

  test("broad branch keeps non-numeric ids (both branches return rows " +
    "on a string-keyed corpus)") {
    // The post-filter semi-join once cast the id to long — string ids
    // became all-NULL, the semi-join matched nothing, and the broad
    // branch silently returned an empty frame while the selective branch
    // worked: output flipped on measured selectivity alone.
    val c = corpus().select(concat(lit("doc-"),
      col("vec_id").cast("string")).as("vec_id"), col("label"),
      col("embedding"))
    val probes = c.filter(col("label") === 0).limit(4)
    val broad = FilteredAnn.topK(probes, c, "vec_id", "embedding",
      col("label") < 8, k = 3, selectivityThreshold = 0.15,
      numPlanes = 2, tables = 4)
    assert(broad.count() > 0, "broad branch empty on string ids")
    val labels = c.select(col("vec_id").as("neighbor_id"), col("label"))
    assert(broad.join(labels, "neighbor_id")
      .filter(col("label") >= 8).isEmpty)
    val selective = FilteredAnn.topK(probes, c, "vec_id", "embedding",
      col("label") === 3, k = 3, selectivityThreshold = 0.15)
    assert(selective.count() > 0, "selective branch empty on string ids")
  }

  test("graph router: broad walks the beam pool and post-filters; " +
    "selective is the exact pre-filter brute") {
    val c = corpus()
    val g = NnDescent.knnGraph(c, "vec_id", "embedding",
      k = 6, rounds = 2, maxDegree = 14, simPrecision = 6)
    val probes = c.filter(col("vec_id") < 8)
    // Broad: survivors all qualify, ranks dense, ≤ k per probe.
    val broad = FilteredAnn.topKGraph(g, "query_id", "neighbor_id",
      probes, c, "vec_id", "embedding", col("label") < 8, k = 4,
      beam = 24, selectivityThreshold = 0.15, rounds = 3, entries = 6,
      overlay = 2, simPrecision = 6)
    val labels = c.select(col("vec_id").as("neighbor_id"), col("label"))
    assert(broad.count() > 0)
    assert(broad.join(labels, "neighbor_id")
      .filter(col("label") >= 8).isEmpty, "unqualified row surfaced")
    // Both branches self-exclude — the walk keeps the probe's own node,
    // so the broad branch must drop it (probes here qualify and come
    // from the corpus: without the filter every probe's rank 1 is
    // itself and the route flip changes semantics).
    assert(broad.filter(col("query_id") === col("neighbor_id")).isEmpty,
      "self row surfaced on the broad graph branch")
    val byQ = broad.groupBy("query_id")
      .agg(count(lit(1)).as("n"), max("rank").as("mx")).collect()
    byQ.foreach(r => assert(r.getLong(1) == r.getInt(2).toLong))
    assert(byQ.forall(_.getLong(1) <= 4))
    // Selective: identical to the shared exact pre-filter branch.
    val sel = FilteredAnn.topKGraph(g, "query_id", "neighbor_id",
      probes, c, "vec_id", "embedding", col("label") === 3, k = 4,
      beam = 24, selectivityThreshold = 0.15, simPrecision = 6)
    val truth = Similarity.bruteForceTopK(probes,
      c.filter(col("label") === 3), "vec_id", "embedding", k = 4)
      .select("query_id", "neighbor_id", "rank")
    assert(pairs(sel) == pairs(truth))
  }

  test("threshold flips the route; empty match returns no rows") {
    val c = corpus()
    val pred = col("label") === 3
    assert(!FilteredAnn.route(c, pred, 0.05).preFilter) // 10% > 5%
    assert(FilteredAnn.route(c, pred, 0.15).preFilter)
    val none = FilteredAnn.topK(c.filter(col("vec_id") < 4), c,
      "vec_id", "embedding", col("label") === 42, k = 3)
    assert(none.isEmpty)
  }
}
