package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphSearchSpec extends AnyFunSuite with SparkTestBase {

  // Same deterministic clustered fixture family as NnDescentSpec: one-hot
  // cluster axis + arithmetic noise, identical on any partitioning.
  private def clustered(n: Int = 240, clusters: Int = 16, dims: Int = 12) = {
    import spark.implicits._
    (0 until n).map { i =>
      val c = i % clusters
      val v = Array.tabulate(dims) { d =>
        val noise = (((i * 31 + d * 7) % 11) - 5) / 20.0f
        (if (d == c % dims) 2.0f else 0.0f) + noise
      }
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  private def graphOf(corpus: DataFrame) =
    NnDescent.knnGraph(corpus, "vec_id", "embedding", k = 5, rounds = 6)

  // Self-filter + re-top to k: the walk finds the probe's own node (it is
  // in the corpus); truth excludes self — identical footing (the
  // tools/AnnCurves normalization).
  private def normalize(df: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(col("rank").asc)
    df.filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= k)
      .select("query_id", "neighbor_id")
  }

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("beam search recall >= 0.9 against brute top-k on the clustered corpus") {
    val corpus = clustered()
    val probes = corpus.filter(col("vec_id") < 40)
    // k+1 then self-filter + re-top (the tools/AnnCurves footing): the
    // walk always finds the probe's own corpus node at rank 1.
    val got = GraphSearch.topK(graphOf(corpus), "query_id", "neighbor_id",
      corpus, "vec_id", "embedding", probes, "vec_id", "embedding",
      k = 6, beam = 12, rounds = 6, entries = 4)
    val truth = Similarity.bruteForceTopK(probes, corpus,
      "vec_id", "embedding", k = 5)
    val g = pairSet(normalize(got, 5))
    val t = pairSet(truth)
    val recall = (g intersect t).size.toDouble / t.size
    assert(recall >= 0.9, s"recall $recall")
  }

  test("finds the probe's own node at rank 1 when the probe is in the corpus") {
    val corpus = clustered(n = 120)
    val probes = corpus.filter(col("vec_id") < 10)
    val got = GraphSearch.topK(graphOf(corpus), "query_id", "neighbor_id",
      corpus, "vec_id", "embedding", probes, "vec_id", "embedding",
      k = 3, beam = 10, rounds = 6, entries = 4)
    val tops = got.filter(col("rank") === 1)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(tops.length == 10)
    tops.foreach { case (q, n) => assert(q == n, s"probe $q topped by $n") }
  }

  test("output is partitioning-invariant and early exit equals full rounds") {
    val corpus = clustered(n = 120)
    val graph = graphOf(corpus).localCheckpoint()
    val probes = corpus.filter(col("vec_id") < 8)
    def run(c: DataFrame, rounds: Int) = GraphSearch.topK(
      graph, "query_id", "neighbor_id", c, "vec_id", "embedding",
      probes, "vec_id", "embedding", k = 4, beam = 8, rounds = rounds,
      entries = 3, simPrecision = 6)
    def rows(df: DataFrame): Set[(Long, Long, Int)] =
      df.select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val a = rows(run(corpus.repartition(13), 6))
    val b = rows(run(corpus.repartition(1), 6))
    assert(a == b)
    // Early-exit equivalence needs a beam that actually converges: a
    // wide-open beam on a small corpus dies (every row expanded, nothing
    // new survives) well before 8 rounds, so 8 and 16 must agree exactly.
    val small = clustered(n = 60)
    val g2 = graphOf(small).localCheckpoint()
    val p2 = small.filter(col("vec_id") < 5)
    def run2(rounds: Int) = rows(GraphSearch.topK(
      g2, "query_id", "neighbor_id", small, "vec_id", "embedding",
      p2, "vec_id", "embedding", k = 4, beam = 30, rounds = rounds,
      entries = 3, simPrecision = 6))
    assert(run2(8) == run2(16))
  }

  test("loop checkpoints release; only the final beam stays pinned") {
    import org.apache.spark.storage.StorageLevel
    def live() = spark.sparkContext.getPersistentRDDs.values
      .count(_.getStorageLevel != StorageLevel.NONE)
    val corpus = clustered(n = 120)
    val probes = corpus.filter(col("vec_id") < 6)
    val g = graphOf(corpus).localCheckpoint(true)
    g.count()
    val before = live()
    val out = GraphSearch.topK(g, "query_id", "neighbor_id",
      corpus, "vec_id", "embedding", probes, "vec_id", "embedding",
      k = 3, beam = 8, rounds = 3, entries = 3, overlay = 2)
    out.count()
    // v/q/adj, every superseded beam round, AND the overlay's
    // Ordinals.assign pin are released inside topK — only the final
    // beam's blocks survive for the caller (the CC fixpoint contract).
    val after = live()
    assert(after - before <= 1, s"leaked ${after - before - 1} block sets")
    Checkpoints.releaseTree(out)
    assert(live() - before <= 0)
    Checkpoints.release(g)
  }

  test("plan: probe-keyed windows only, no cartesian, no single-partition exchange") {
    val corpus = clustered(n = 80)
    val probes = corpus.filter(col("vec_id") < 5)
    val df = GraphSearch.topK(graphOf(corpus), "query_id", "neighbor_id",
      corpus, "vec_id", "embedding", probes, "vec_id", "embedding",
      k = 3, beam = 6, rounds = 2, entries = 3)
    val plan = df.queryExecution.executedPlan.toString
    val lines = plan.split('\n').map(_.trim)
    // Beam windows are probe-keyed; the overlay's ordinal windows are
    // tile-keyed (the Ordinals machinery). Nothing unpartitioned.
    lines.filter(_.contains("Window")).foreach { w =>
      assert(w.contains("qid#") || w.contains("__pid"),
        s"unkeyed window:\n$w\n$plan")
    }
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("Exchange SinglePartition"), plan)
  }
}
