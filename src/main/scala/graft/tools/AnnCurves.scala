package graft.tools

import graft.Tables
import graft.ops.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ANN tuning curves: measured recall@k and wall seconds vs the knobs a
  * user actually turns — `nprobe`/`candidateK` for IVF / IVF-PQ,
  * `tables`/`flips` for (multi-probe) LSH — against brute-force truth on
  * the real embeddings fixture. The numbers land in BASELINE.md so the
  * shipped defaults are data-motivated, not folklore (what FAISS users
  * get from its published benchmark sweeps).
  *
  * Usage: runMain graft.tools.AnnCurves [sfDir]
  * Prints one JSON line per configuration.
  *
  * Method notes: probes are the first 100 corpus vectors, truth is
  * exact cosine top-k EXCLUDING self; the approximate operators do not
  * self-exclude, so their output is self-filtered and re-topped to k
  * before the overlap count — every family is scored on identical
  * terms. Timing is the operator's own count() (steady-state second
  * run, after a warm-up first run absorbs plan/codegen cost).
  */
object AnnCurves {

  private val K = 10

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ann-curves")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val raw = Tables.embeddings(spark, sfDir)

    // Two corpora, because recall on i.i.d.-random vectors measures the
    // DATA, not the index: random high-dim embeddings concentrate — every
    // neighbor is nearly equidistant, so no bucketing scheme can recall
    // well and the sweep only shows the knobs' monotone direction. The
    // "clustered" variant blends each vector 60% toward its label
    // centroid (10 real clusters), the structure production embeddings
    // actually have — that is the corpus the default recommendation
    // reads from.
    val centroids = raw
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("label", "pos").agg(avg(col("x").cast("double")).as("c"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("cs"))
      .select(col("label"), transform(col("cs"), s => s.getField("c")).as("__c"))
    val clustered = raw.join(centroids, "label")
      .select(col("vec_id"),
        zip_with(col("embedding"), col("__c"),
          (x, c) => x.cast("double") * 0.4 + c * 0.6).as("embedding"),
        col("label"))
      .localCheckpoint(true)
    clustered.count()

    for ((corpusName, emb) <- Seq("random" -> raw, "clustered" -> clustered)) {
      val probes = emb.filter(col("vec_id") < 100)
      val truth = Similarity.bruteForceTopKAgg(probes, emb, "vec_id",
        "embedding", K)
        .select(col("query_id"), col("neighbor_id"))
        .localCheckpoint(true)
      val nTruth = truth.count().toDouble

      // Self-filter + re-top: ask the operator for K+1, drop
      // query==neighbor, keep the best K by the operator's own rank —
      // identical footing to the self-excluding truth.
      def normalize(df: DataFrame): DataFrame = {
        val w = Window.partitionBy("query_id").orderBy(col("rank").asc)
        df.filter(col("query_id") =!= col("neighbor_id"))
          .withColumn("__r", row_number().over(w))
          .filter(col("__r") <= K)
          .select("query_id", "neighbor_id")
      }

      def measure(family: String, params: String)(build: => DataFrame): Unit = {
        def once(): Double = {
          val t0 = System.nanoTime()
          build.count()
          (System.nanoTime() - t0) / 1e9
        }
        once() // warm-up: plan + codegen
        val sec = once()
        val hits = normalize(build)
          .join(truth, Seq("query_id", "neighbor_id"), "left_semi").count()
        val recall = hits / nTruth
        println(f"""{"corpus":"$corpusName","family":"$family",$params%s,"recall":$recall%.3f,"sec":$sec%.2f}""")
      }

      // IVF-flat: sampled centroids (the deployed default), nprobe sweep.
      for (nprobe <- Seq(1, 2, 4, 8))
        measure("ivf", s""""nprobe":$nprobe""") {
          Similarity.ivfTopK(probes, emb, "vec_id", "embedding", K + 1,
            centroidMod = 25, nprobe = nprobe)
        }

      // IVF with a LEARNED codebook (k-means, nlist ≈ √n) — the
      // production path ivfTopKWith exists for: lists follow actual
      // density instead of id-sampled rows.
      val km = graft.ml.KMeans.fit(emb, "vec_id", "embedding",
        k = 45, iterations = 5)
      val kmCent = graft.ml.KMeans.centroidFrame(emb, km)
      for (nprobe <- Seq(1, 2, 4, 8))
        measure("ivf-kmeans", s""""nlist":45,"nprobe":$nprobe""") {
          Similarity.ivfTopKWith(probes, emb, "vec_id", "embedding", K + 1,
            kmCent, "centroid_id", "centroid", nprobe)
        }

      // IVF-PQ: the q_ivf_pq_topk model (dims 64, m=4, k=4 codewords,
      // 2 iterations), nprobe × candidateK sweep.
      val model = graft.ml.Pq.fit(emb, "vec_id", "embedding",
        dims = 64, m = 4, k = 4, iterations = 2)
      val codes = graft.ml.Pq.encode(emb, "vec_id", "embedding", model)
        .localCheckpoint(true)
      codes.count()
      for (nprobe <- Seq(1, 2, 4, 8); candMult <- Seq(1, 2, 4))
        measure("ivfpq",
          s""""nprobe":$nprobe,"candidateK":${candMult * (K + 1)}""") {
          Similarity.ivfPqTopK(probes, emb, codes, "vec_id", "embedding",
            model, K + 1, candidateK = candMult * (K + 1),
            centroidMod = 25, nprobe = nprobe)
        }

      // One production-sized PQ row: the sweep above uses the gated
      // oracle model (m=4, k=4 — 2-bit codes, chosen for SQL-replay
      // tractability) whose recall ceiling is the quantizer, not the
      // operator. m=8 subspaces × 16 codewords (4-bit codes, still 16×
      // compression) is the FAISS-default shape — the row that shows
      // where the ceiling moves when the model is sized for serving.
      val bigModel = graft.ml.Pq.fit(emb, "vec_id", "embedding",
        dims = 64, m = 8, k = 16, iterations = 3)
      val bigCodes = graft.ml.Pq.encode(emb, "vec_id", "embedding",
        bigModel).localCheckpoint(true)
      bigCodes.count()
      measure("ivfpq", s""""m":8,"k":16,"nprobe":8,"candidateK":44""") {
        Similarity.ivfPqTopK(probes, emb, bigCodes, "vec_id", "embedding",
          bigModel, K + 1, candidateK = 4 * (K + 1),
          centroidMod = 25, nprobe = 8)
      }
      graft.ops.Checkpoints.release(bigCodes)

      // LSH: 8 planes, table sweep; multi-probe: 1 table, flip sweep.
      for (tables <- Seq(1, 2, 4))
        measure("lsh", s""""planes":8,"tables":$tables""") {
          Similarity.lshTopK(probes, emb, "vec_id", "embedding", K + 1,
            numPlanes = 8, tables = tables)
        }
      for (flips <- Seq(4, 8))
        measure("mp-lsh", s""""planes":8,"tables":1,"flips":$flips""") {
          Similarity.lshTopKMultiProbe(probes, emb, "vec_id", "embedding",
            K + 1, numPlanes = 8, tables = 1, flips = flips)
        }

      // Graph search: NN-Descent build charged ONCE (its own line — the
      // graph is an index, amortized like the IVF tree), then the beam
      // sweep. The walk's scoring budget is beam·(k+overlay)·rounds per
      // probe; compare against IVF rows at matching recall.
      val tg0 = System.nanoTime()
      val knn = graft.ops.NnDescent.knnGraph(emb, "vec_id", "embedding",
        k = 10, rounds = 4).localCheckpoint(true)
      knn.count()
      val buildSec = (System.nanoTime() - tg0) / 1e9
      println(f"""{"corpus":"$corpusName","family":"graph-build","k":10,"rounds":4,"sec":$buildSec%.2f}""")
      for ((beamW, rounds) <- Seq((16, 3), (32, 4), (64, 4)))
        measure("graph", s""""beam":$beamW,"rounds":$rounds""") {
          graft.ops.GraphSearch.topK(knn, "query_id", "neighbor_id",
            emb, "vec_id", "embedding", probes, "vec_id", "embedding",
            K + 1, beam = beamW, rounds = rounds, entries = 8)
        }
      graft.ops.Checkpoints.release(knn)

      // Maintained-index search QUALITY: the graph-maint rehearsal
      // measures maintenance TIME vs rebuild; this measures what the
      // stitch COSTS IN RECALL. Build the persisted index on the oldest
      // 90% of ids, stitch the newest 10% in as one maintenance batch
      // (seed walk + localized descent — the streaming sink's batch
      // body), and run the same beam sweep through the maintained edges.
      // The claim under test: a maintained graph searches like a rebuilt
      // one; if it didn't, the maintenance sink would be a slow rebuild
      // with extra steps.
      {
        val n = emb.count()
        val cutId = (n * 9) / 10
        val mpath = s"${System.getProperty("java.io.tmpdir")}/" +
          s"graft_curves_maint_${spark.sparkContext.applicationId}_$corpusName"
        try {
        graft.ops.GraphIndex.write(spark, mpath,
          emb.filter(col("vec_id") < cutId), "vec_id", "embedding",
          k = 10, rounds = 4)
        graft.ops.GraphIndex.applyMaintenanceBatch(spark, mpath,
          emb.filter(col("vec_id") >= cutId), "vec_id", "embedding",
          k = 10, rounds = 2, beam = 32)
        val medges = graft.ops.GraphIndex.edges(spark, mpath)
          .localCheckpoint(true)
        medges.count()
        for ((beamW, rounds) <- Seq((32, 4), (64, 4)))
          measure("graph-maintained", s""""beam":$beamW,"rounds":$rounds""") {
            graft.ops.GraphSearch.topK(medges, "id", "nbr",
              emb, "vec_id", "embedding", probes, "vec_id", "embedding",
              K + 1, beam = beamW, rounds = rounds, entries = 8)
          }
        graft.ops.Checkpoints.release(medges)
        // finally: a failing measure() must not strand the tree until
        // the startup sweep (which also knows this prefix) reclaims it.
        } finally graft.ops.LocalFs.deleteRecursively(mpath)
      }

      // ColBERT MaxSim: recall/latency of the token-ANN candidate path
      // (MaxSim.topKViaAnn, prod xxhash planes) and of the persisted
      // token index vs the EXACT late-interaction scorer — the knob
      // sweep (tokenK, planes, tables) the IVF/graph families already
      // have. Tokens are the q_maxsim shape: 4 slices of 16 dims.
      // Truth self-excludes; candidates are normalized identically.
      {
        def toks(df: DataFrame) = df
          .filter(col("embedding").isNotNull)
          .select(col("vec_id"), posexplode(array((0 until 4).map(t =>
            slice(col("embedding").cast("array<double>"),
              t * 16 + 1, 16)): _*)).as(Seq("pos", "tv")))
        val corpusToks = toks(emb).localCheckpoint(true)
        corpusToks.count()
        val probeToks = toks(probes).localCheckpoint(true)
        probeToks.count()
        def msNormalize(df: DataFrame): DataFrame = {
          val w = Window.partitionBy("query_id").orderBy(col("rank").asc)
          df.filter(col("query_id") =!= col("doc_id"))
            .withColumn("__r", row_number().over(w))
            .filter(col("__r") <= K)
            .select(col("query_id"), col("doc_id"))
        }
        val msTruth = msNormalize(graft.ops.MaxSim.topK(probeToks,
            corpusToks, "vec_id", "pos", "tv", K + 1))
          .localCheckpoint(true)
        val nMsTruth = msTruth.count().toDouble
        def msMeasure(family: String, params: String)(
            build: => DataFrame): Unit = {
          def once(): Double = {
            val t0 = System.nanoTime()
            build.count()
            (System.nanoTime() - t0) / 1e9
          }
          once() // warm-up
          val sec = once()
          val hits = msNormalize(build)
            .join(msTruth, Seq("query_id", "doc_id"), "left_semi").count()
          val recall = hits / nMsTruth
          println(f"""{"corpus":"$corpusName","family":"$family",$params%s,"recall":$recall%.3f,"sec":$sec%.2f}""")
        }
        for (tokenK <- Seq(4, 8, 16, 32))
          msMeasure("maxsim-ann", s""""tokenK":$tokenK,"planes":8,"tables":2""") {
            graft.ops.MaxSim.topKViaAnn(probeToks, corpusToks,
              "vec_id", "pos", "tv", K + 1, tokenK = tokenK,
              numPlanes = 8, tables = 2)
          }
        for (planes <- Seq(4, 6, 8))
          msMeasure("maxsim-ann", s""""tokenK":8,"planes":$planes,"tables":2""") {
            graft.ops.MaxSim.topKViaAnn(probeToks, corpusToks,
              "vec_id", "pos", "tv", K + 1, tokenK = 8,
              numPlanes = planes, tables = 2)
          }
        for (tables <- Seq(1, 4))
          msMeasure("maxsim-ann", s""""tokenK":8,"planes":8,"tables":$tables""") {
            graft.ops.MaxSim.topKViaAnn(probeToks, corpusToks,
              "vec_id", "pos", "tv", K + 1, tokenK = 8,
              numPlanes = 8, tables = tables)
          }
        // Persisted token index: build charged once (its own line, the
        // graph-build convention), then the default-knob probe through
        // the artifact (md5 planes — the only family the index stores).
        val mspath = s"${System.getProperty("java.io.tmpdir")}/" +
          s"graft_msidx_curves_${spark.sparkContext.applicationId}_$corpusName"
        try {
          val tb0 = System.nanoTime()
          graft.ops.MaxSimIndex.write(spark, mspath, corpusToks,
            "vec_id", "pos", "tv", dims = 16, numPlanes = 8, tables = 2)
          val msBuild = (System.nanoTime() - tb0) / 1e9
          println(f"""{"corpus":"$corpusName","family":"maxsim-index-build","planes":8,"tables":2,"sec":$msBuild%.2f}""")
          for (tokenK <- Seq(8, 32))
            msMeasure("maxsim-index", s""""tokenK":$tokenK,"planes":8,"tables":2""") {
              graft.ops.MaxSimIndex.topK(spark, mspath, probeToks,
                "vec_id", "pos", "tv", K + 1, tokenK = tokenK)
            }
        } finally graft.ops.LocalFs.deleteRecursively(mspath)
        graft.ops.Checkpoints.release(msTruth)
        graft.ops.Checkpoints.release(corpusToks)
        graft.ops.Checkpoints.release(probeToks)
      }

      graft.ops.Checkpoints.release(truth)
      graft.ops.Checkpoints.release(codes)
    }
    graft.ops.Checkpoints.release(clustered)
    spark.stop()
  }
}
