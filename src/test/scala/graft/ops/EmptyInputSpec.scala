package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Empty inputs must yield empty (not crash) across the round-6 operator
  * family — the degenerate case every scheduled pipeline eventually hits
  * (an empty increment, a filter that matches nothing).
  */
class EmptyInputSpec extends AnyFunSuite with SparkTestBase {

  private def emptyDocs = {
    import spark.implicits._
    Seq.empty[(Long, String)].toDF("doc_id", "text")
  }

  test("TfIdf, Chunker, Repetition on an empty corpus") {
    assert(graft.text.TfIdf.topTerms(emptyDocs, "doc_id", "text", 3).count() == 0)
    assert(graft.text.Chunker.chunk(emptyDocs, "doc_id", "text", 50, 10).count() == 0)
    assert(graft.text.Repetition.profile(emptyDocs, "doc_id", "text").count() == 0)
  }

  test("FuzzyJoin, Quantiles, Reconcile on empty tables") {
    import spark.implicits._
    val e = Seq.empty[(Long, String)].toDF("id", "name")
    assert(FuzzyJoin.selfJoin(e, "id", "name", 2, 1).count() == 0)
    val en = Seq.empty[(Long, Double)].toDF("id", "x")
    assert(Quantiles.bucketize(en, "x", Seq(0.5), exact = true).count() == 0)
    assert(Reconcile.snapshotDiff(e, e, Seq("id")).count() == 0)
    // One empty side: everything classifies one way.
    val a = Seq((1L, "x")).toDF("id", "name")
    assert(Reconcile.snapshotDiff(a, e, Seq("id"))
      .as[(Long, String)].collect().toSet == Set((1L, "removed")))
    assert(Reconcile.snapshotDiff(e, a, Seq("id"))
      .as[(Long, String)].collect().toSet == Set((1L, "added")))
  }

  test("session-2 text/graph/ml operators on empty inputs") {
    import spark.implicits._
    assert(graft.text.LmScore.avgLogProb(emptyDocs, "doc_id", "text").count() == 0)
    assert(graft.text.Winnowing.profile(emptyDocs, "doc_id", "text").count() == 0)
    assert(graft.text.Distinctive.chiSquaredTerms(
      emptyDocs.withColumn("source", lit("s")), "source", "text", 3, 1L).count() == 0)
    assert(graft.text.Bpe.learnMerges(emptyDocs, "text", 2).count() == 0)
    val ee = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(graft.graph.Triangles.perNode(ee, "src", "dst").count() == 0)
    assert(graft.graph.LabelPropagation.communities(ee, "src", "dst", 2).count() == 0)
    val ev = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(graft.ml.KMeans.fitAssign(ev, "vec_id", "embedding", 2, 1).count() == 0)
    assert(TimeSeries.ewmaFixedPoint(
      Seq.empty[(String, Long, Long)].toDF("k", "t", "v"), "k", "t", "v", 1, 8)
      .count() == 0)
    assert(Regression.groupTrend(
      Seq.empty[(String, Long, Double)].toDF("g", "x", "y"), Seq("g"), "x", "y")
      .count() == 0)
    assert(Sharding.weightedSample(
      Seq.empty[(Long, Double)].toDF("id", "w"), "id", "w", 5).count() == 0)
  }

  test("TimeSeries interpolate / trailing window on an empty series") {
    import spark.implicits._
    val s = Seq.empty[(java.sql.Date, Double)].toDF("d", "v")
    assert(TimeSeries.interpolateLinear(s, "d", "v",
      TimeSeries.weekChunk(col("d"))).count() == 0)
    assert(TimeSeries.trailingWindow(s, "d", "v", 7).count() == 0)
  }

  test("round-10 operators on empty inputs") {
    import spark.implicits._
    val ts = Seq.empty[(String, Long, Long)].toDF("k", "t", "v")
    assert(TimeSeries.holtFixedPoint(ts, "k", "t", "v", 1, 4, 1, 5, 7)
      .count() == 0)
    assert(TimeSeries.cusum(ts, "k", "t", "v", 0L, 10L).count() == 0)
    val sy = Seq.empty[(Long, Boolean)].toDF("s", "y")
    assert(graft.ml.Eval.rocPoints(sy, col("s"), col("y")).count() == 0)
    assert(graft.ml.Eval.calibrationBins(
      Seq.empty[(Double, Boolean)].toDF("pr", "y"),
      col("pr"), col("y"), 10).count() == 0)
    // Scalar readouts keep their one-row shape with NULL statistics.
    val units = Seq.empty[(Long, Boolean, Boolean)].toDF("id", "t", "c")
    val ab = Experiment.abTest(units, col("t"), col("c")).head()
    assert(ab.isNullAt(5) && ab.isNullAt(6))
    val cu = Experiment.cuped(
      Seq.empty[(Boolean, Long, Long)].toDF("t", "x", "y"),
      col("t"), col("x"), col("y")).head()
    assert(cu.isNullAt(2) && cu.isNullAt(4))
    assert(Experiment.msprt(
      Seq.empty[(Long, Boolean, Boolean)].toDF("day", "t", "c"),
      col("t"), col("c"), col("day"), 1e-2).count() == 0)
    assert(FuzzyJoin.jaroWinklerSelfJoin(
      Seq.empty[(Long, String)].toDF("id", "nm"), "id", "nm", 4, 0.9)
      .count() == 0)
    val surv = Seq.empty[(Long, Boolean)].toDF("dur", "obs")
    assert(Experiment.kaplanMeier(surv, col("dur"), col("obs")).count() == 0)
    val two = Seq.empty[(Long, Boolean)].toDF("v", "a")
    assert(Drift.wasserstein1(two, col("v"), col("a")).head().isNullAt(2))
    assert(Drift.ksStatistic(two, col("v"), col("a")).head().isNullAt(2))
    assert(Experiment.upliftCurve(
      Seq.empty[(Long, Boolean, Boolean)].toDF("s", "t", "c"),
      col("s"), col("t"), col("c")).count() == 0)
  }

  test("round-11 operators on empty inputs") {
    import spark.implicits._
    // HyperANF on an empty edge set: no nodes → every NF(t) row exists
    // (one per t, the readout contract) with a NULL sum.
    val ee = Seq.empty[(Long, Long)].toDF("src", "dst")
    val nf = graft.graph.HyperAnf.neighborhoodFunction(ee, "src", "dst", 2)
      .orderBy("t").collect()
    assert(nf.length == 3 && nf.forall(_.isNullAt(1)))
    // IVF-PQ on an empty corpus with a degenerate model: no probes can
    // route → empty result (model fit needs data, so fit on a singleton).
    val one = Seq((0L, Array.fill(8)(1.0f))).toDF("vec_id", "embedding")
    val model = graft.ml.Pq.fit(one, "vec_id", "embedding", dims = 8,
      m = 2, k = 1, iterations = 1)
    val ev = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.ivfPqTopK(ev, one, graft.ml.Pq.encode(one, "vec_id",
      "embedding", model), "vec_id", "embedding", model, k = 1,
      candidateK = 1, centroidMod = 1, nprobe = 1).count() == 0)
    // Streaming monitors: merging an empty batch commits the id but adds
    // nothing; estimates stay live and unchanged.
    val dRoot = java.nio.file.Files.createTempDirectory("graft_e11d").toString
    val dMon = new graft.streaming.StreamingDistinct(dRoot, "item", Nil)
    dMon.mergeBatch(Seq("x", "y").toDF("item"), 0L)
    val before = dMon.estimates(spark).get.head.getDouble(0)
    dMon.mergeBatch(Seq.empty[String].toDF("item"), 1L)
    assert(dMon.store.committedBatchId == 1L)
    assert(dMon.estimates(spark).get.head.getDouble(0) == before)
    val cRoot = java.nio.file.Files.createTempDirectory("graft_e11c").toString
    val cMon = new graft.streaming.StreamingCountMin(cRoot, "item", 2, 16)
    cMon.mergeBatch(Seq.empty[String].toDF("item"), 0L)
    assert(cMon.committedBatchId == 0L)
    assert(cMon.sketch(spark).get.count() == 0)
  }

  test("round-12 operators on empty inputs") {
    import spark.implicits._
    val es = Seq.empty[(String, Long, Long)].toDF("k", "t", "y")
    assert(TimeSeries.changePoints(es, "k", "t", "y", depth = 2).count() == 0)
    assert(TimeSeries.theilSen(es, "k", "t", "y").count() == 0)
    val er = Seq.empty[(Long, Int)].toDF("doc_id", "rank")
    assert(graft.text.Retrieval.rrfFuse(Seq(er, er), "doc_id", "rank")
      .count() == 0)
    val en = Seq.empty[(Long, String)].toDF("id", "name")
    assert(graft.ml.Blocking.sortedNeighborhood(en, "id", col("name"), 2)
      .count() == 0)
    assert(graft.ml.Blocking.multiPass(en, "id",
      Seq(col("name"), reverse(col("name"))), 2).count() == 0)
    val ec = Seq.empty[(Long, Long, Array[Float], Double)]
      .toDF("q", "id", "vec", "rel")
    assert(Mmr.select(ec, "q", "id", "vec", "rel", k = 3).count() == 0)
    assert(graft.text.WordPiece.learnMerges(emptyDocs, "text", 2)
      .count() == 0)
    assert(graft.text.WordPiece.tokenCounts(emptyDocs, "doc_id", "text", 2)
      .count() == 0)
  }

  test("round-14 operators on empty inputs") {
    import spark.implicits._
    val ev = Seq.empty[(Long, Array[Double])].toDF("vec_id", "embedding")
    val v = Seq((1L, Array(1.0, 0.0)), (2L, Array(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val et = Seq.empty[(Long, Int, Array[Double])].toDF("id", "pos", "tv")
    val t = Seq((1L, 0, Array(1.0, 0.0))).toDF("id", "pos", "tv")
    // MaxSim: empty probes, empty corpus, both tiers.
    assert(MaxSim.topK(et, t, "id", "pos", "tv", 3).count() == 0)
    assert(MaxSim.topK(t, et, "id", "pos", "tv", 3).count() == 0)
    assert(MaxSim.topKViaAnn(et, t, "id", "pos", "tv", 3).count() == 0)
    assert(MaxSim.topKViaAnn(t, et, "id", "pos", "tv", 3).count() == 0)
    // FilteredAnn: empty corpus routes selective (frac 0) and yields
    // nothing; empty probes yield nothing on the broad branch.
    assert(FilteredAnn.topK(v, ev, "vec_id", "embedding",
      lit(true), k = 2).count() == 0)
    assert(FilteredAnn.topK(ev, v, "vec_id", "embedding",
      lit(true), k = 2, selectivityThreshold = 0.1).count() == 0)
    // GraphSearch: empty probe set walks nothing; an empty GRAPH still
    // serves entry-set hits (the entry cross is corpus-driven).
    val eg = Seq.empty[(Long, Long)].toDF("src", "dst")
    val g = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    assert(GraphSearch.topK(g, "src", "dst", v, "vec_id", "embedding",
      ev, "vec_id", "embedding", k = 2).count() == 0)
    assert(GraphSearch.topK(eg, "src", "dst", v, "vec_id", "embedding",
      v, "vec_id", "embedding", k = 2, entries = 2).count() > 0)
    // topKGraph: empty corpus → selective route → empty.
    assert(FilteredAnn.topKGraph(g, "src", "dst", v, ev,
      "vec_id", "embedding", lit(true), k = 2, beam = 4).count() == 0)
  }
}
