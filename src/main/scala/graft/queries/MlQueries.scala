package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ml.{KMeans, Pq}

/** Distributed-ML primitives over the embeddings table: the codebook /
  * clustering / compression layer a curation pipeline runs between dedup
  * and sampling (cluster-then-sample, IVF cell assignment, PQ codebooks).
  */
object MlQueries extends QueryGroup {

  /** The shared persisted IVF-PQ serving tree (full corpus, %25 coarse
    * codebook, the q_ivf_pq_topk PQ model) — one fit+encode+write per
    * process via the real [[graft.ops.PqIndex.write]] path:
    * q_ann_ivfpq_persist probes it, q_ann_ivfpq_delete branches it.
    * Registered with [[SharedGraphs]] (appId-keyed path, shutdown-hook
    * cleanup, sweepable `graft_gidx_` prefix family).
    */
  private def sharedPqPath(s: org.apache.spark.sql.SparkSession,
      dir: String): String =
    SharedGraphs.ensure(s, dir, "pq_m25") { path =>
      val emb = Tables.embeddings(s, dir)
      val model = Pq.fit(emb, "vec_id", "embedding",
        dims = 64, m = 4, k = 4, iterations = 2)
      val cent = emb.filter(col("embedding").isNotNull)
        .filter(pmod(col("vec_id"), lit(25)) === 0 &&
          col("vec_id") < 12500)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("centroid"))
      graft.ops.PqIndex.write(s, path, emb, "vec_id", "embedding",
        cent, model)
    }

  /** Shared-tree builders for harness instrumentation — see
    * [[SimilarityQueries.sharedBuilders]].
    */
  val sharedBuilders: Map[String,
      (org.apache.spark.sql.SparkSession, String) => String] = Map(
    "pq_m25" -> (sharedPqPath _))

  val queries: Map[String, Q] = Map(
    // Sorted-neighborhood blocking (Hernández–Stolfo multi-pass): part
    // names sorted forward and REVERSED, every record paired with its 3
    // successors per pass, unordered pairs kept at their smallest window
    // distance. Candidate volume is w·n per pass by construction — the
    // linear-in-table alternative to equi-blocking for typo'd keys; the
    // global order comes from Ordinals (range-tiled, never a
    // single-partition window).
    "q_snm_blocking" -> ((s, dir) => {
      graft.ml.Blocking.multiPass(
        Tables.part(s, dir), "p_partkey",
        Seq(col("p_name"), reverse(col("p_name"))), w = 3)
        .select(col("id_a"), col("id_b"), col("w_dist").cast("int").as("w_dist"),
          col("n_passes"))
    }),

    // Lloyd's k-means, k=8, 3 rounds, integer milli-unit arithmetic: seeds
    // are the 8 smallest md5(vec_id) rows, assignment is an argmin over 8
    // codegen'd literal-centroid dot products (map-only), each update is
    // one (cluster,pos)-keyed partial-agg'd shuffle of k×64 slim rows.
    // Exact integers end to end → bit-identical to the unrolled oracle.
    "q_kmeans" -> ((s, dir) =>
      KMeans.fitAssign(Tables.embeddings(s, dir), "vec_id", "embedding",
        k = 8, iterations = 3)),

    // Product quantization: 4 subspaces × 16 dims, k=4, 2 Lloyd rounds
    // per subspace; encode is ONE fused map-only projection (4 literal
    // codebooks in a single select). recon_dist = exact summed quantized
    // squared error. The code array is rendered "c0-c1-c2-c3" here because
    // the compare layer sorts on raw cell values and an array cell is not
    // orderable there; the library surface (Pq.encode) keeps ARRAY<INT>.
    "q_pq_encode" -> ((s, dir) =>
      Pq.fitEncode(Tables.embeddings(s, dir), "vec_id", "embedding",
        dims = 64, m = 4, k = 4, iterations = 2)
        .select(col("vec_id"),
          array_join(col("pq_code").cast("array<string>"), "-").as("pq_code"),
          col("recon_dist"))),

    // Frozen-codebook REFIT TRIGGER: fit the PQ model on the EVEN half
    // (the "build corpus"), then measure the odd half's (the "delta")
    // mean quantization error against the build's under that one frozen
    // model — drift_ratio is the number a maintenance cadence alarms on
    // (appends stay EXACT under stale codebooks; what decays silently
    // is ADC recall, and recon_dist is its exact integer proxy).
    // StreamingPqDrift wires the same measurement as a per-micro-batch
    // monitor. The fixture halves are iid so the gated ratio sits near
    // 1 — the oracle pins the MACHINERY (4-subspace integer-exact
    // encode under a half-corpus fit + exact error sums), not a
    // planted drift; the planted-drift direction is spec-gated.
    "q_pq_drift" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val even = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
      val odd = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
      val model = Pq.fit(even, "vec_id", "embedding",
        dims = 64, m = 4, k = 4, iterations = 2)
      Pq.quantizationDrift(even, odd, "vec_id", "embedding", model)
    }),

    // SemDeDup (Abbas et al. 2023): k-means buckets the embeddings (the
    // same integer-exact 8x3 fit as q_kmeans), then cosine near-dups are
    // pruned within clusters only — keep-first by id. The cluster join
    // bounds pair fan-out; all-pairs never appears in the plan.
    "q_semdedup" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      graft.ops.SemDedup.keepFlags(emb, "vec_id", "embedding",
        KMeans.fitAssign(emb, "vec_id", "embedding", k = 8, iterations = 3),
        tau = 0.4)
        .select(col("id").as("vec_id"), col("cluster"), col("kept"))
    }),

    // Farthest-point diversity sample, k=5: greedy max-min over exact
    // quantized distances — each round one map-only pass + TakeOrdered(1).
    "q_fps_sample" -> ((s, dir) =>
      graft.ml.FarthestPoint.sample(Tables.embeddings(s, dir),
        "vec_id", "embedding", k = 5)),

    // ADC search over the PQ codes: probes (vec_id % 50 = 0) build m×k
    // distance tables once; candidates cost m array lookups on 4-byte
    // codes — the corpus never ships vectors. Exact integer distances.
    "q_pq_adc_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val model = Pq.fit(emb, "vec_id", "embedding",
        dims = 64, m = 4, k = 4, iterations = 2)
      Pq.adcTopK(emb.filter(col("vec_id") % 50 === 0),
        Pq.encode(emb, "vec_id", "embedding", model),
        "vec_id", "embedding", model, k = 5)
    }),

    // Two-stage serving: 20 ADC candidates per probe, exact-cosine rerank
    // to top-5 — the full-vector pass touches only the candidates.
    "q_pq_rerank" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val model = Pq.fit(emb, "vec_id", "embedding",
        dims = 64, m = 4, k = 4, iterations = 2)
      Pq.adcRerankTopK(emb.filter(col("vec_id") % 50 === 0), emb,
        Pq.encode(emb, "vec_id", "embedding", model),
        "vec_id", "embedding", model, k = 5, candidateK = 20)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          (round(col("cos"), 4) + lit(0.0)).as("cos"))
    }),

    // Fellegi-Sunter record linkage with unsupervised EM (the Splink
    // model): planted candidate pairs over customer — each record vs a
    // deterministically perturbed twin, even keys duplicate-like, odd
    // keys non-match-like — yield a bimodal comparison-vector mixture;
    // 3 EM rounds learn per-field m/u and the log2(m/u) agreement
    // weights. Responsibilities quantize to a 1e-9 integer grid before
    // every M-step sum, so DuckDB replays the trajectory bit-for-bit.
    "q_fs_linkage" -> ((s, dir) => {
      val c = Tables.customer(s, dir).select(col("c_custkey").as("k"),
        col("c_name"), col("c_mktsegment"), col("c_acctbal"))
      val dup = col("k") % 2 === 0
      val b = c.select(col("k"),
        when(dup && col("k") % 10 =!= 0, col("c_name"))
          .when(!dup && col("k") % 20 === 0, col("c_name"))
          .otherwise(concat(col("c_name"), lit("~"))).as("name_b"),
        when(dup && col("k") % 7 =!= 0, col("c_mktsegment"))
          .when(!dup && col("k") % 5 === 0, col("c_mktsegment"))
          .otherwise(concat(col("c_mktsegment"), lit("~"))).as("seg_b"),
        when(dup && col("k") % 3 =!= 0, col("c_acctbal"))
          .when(!dup && col("k") % 4 === 0, col("c_acctbal"))
          .otherwise(col("c_acctbal") + lit(1)).as("bal_b"))
      val pairs = c.join(b, "k").select(
          (col("c_name") === col("name_b")).as("g_name"),
          (col("c_mktsegment") === col("seg_b")).as("g_seg"),
          (col("c_acctbal") === col("bal_b")).as("g_bal"))
        // Scanned once per EM round: materialize the tiny boolean table.
        .localCheckpoint(eager = false)
      graft.ml.FellegiSunter.fieldWeights(pairs,
        Seq("g_name", "g_seg", "g_bal"), rounds = 3)
    }),

    // IVF-PQ retrieval (the FAISS IVFPQ serving shape): the coarse
    // quantizer of q_ann_ivf_topk routes probes to 3 Voronoi lists, the
    // ADC code scorer of q_pq_adc_topk ranks ONLY in-list candidates to
    // 20, exact cosine re-scores those to top-5. Same codebooks, same
    // integer ADC grid, same rerank arithmetic — the oracle composes the
    // two proven SQL fragments.
    "q_ivf_pq_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val model = Pq.fit(emb, "vec_id", "embedding",
        dims = 64, m = 4, k = 4, iterations = 2)
      graft.ops.Similarity.ivfPqTopK(
        emb.filter(col("vec_id") % 50 === 0), emb,
        Pq.encode(emb, "vec_id", "embedding", model),
        "vec_id", "embedding", model, k = 5, candidateK = 20,
        centroidMod = 25, nprobe = 3, centroidCap = 12500L)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          (round(col("cos"), 4) + lit(0.0)).as("cos"))
    }),

    // Persisted IVF-PQ round trip: probe the SHARED serving artifact
    // (coarse codebook + per-cell lists carrying PQ codes AND vectors
    // in one columnar tree + the integer-exact model rows — built once
    // per process by sharedPqPath through the real PqIndex.write path)
    // with q_ivf_pq_topk's exact parameters — the oracle is shared
    // verbatim, so a mismatch means the parquet round trip, the model
    // rehydration or the stored routing corrupted the pipeline.
    "q_ann_ivfpq_persist" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      graft.ops.PqIndex.topK(s, sharedPqPath(s, dir),
          emb.filter(col("vec_id") % 50 === 0), "vec_id", "embedding",
          k = 5, candidateK = 20, nprobe = 3)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          (round(col("cos"), 4) + lit(0.0)).as("cos"))
    }),

    // Incremental IVF-PQ maintenance under FROZEN codebooks (FAISS
    // IndexIVFPQ.add): build the persisted tree over the EVEN half with
    // the full-corpus-fit model and the %25 coarse codebook, APPEND the
    // odd half (stored-model encode + stored-centroid routing,
    // append-mode write touching only the delta's cells), probe — the
    // final lists equal a full-corpus build's under the same codebooks,
    // so the oracle is q_ann_ivfpq_persist's verbatim. What append does
    // NOT buy is codebook freshness: a drifted delta quantizes worse
    // under stale codebooks (recall, not correctness) — refit+rebuild
    // stays the cadence; this is the between-rebuilds path.
    "q_ann_ivfpq_upsert" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val model = Pq.fit(emb, "vec_id", "embedding",
        dims = 64, m = 4, k = 4, iterations = 2)
      val cent = emb.filter(col("embedding").isNotNull)
        .filter(pmod(col("vec_id"), lit(25)) === 0 &&
          col("vec_id") < 12500)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("centroid"))
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_pqidx_ups_" +
        new java.io.File(dir).getName + "_" + s.sparkContext.applicationId
      graft.ops.PqIndex.write(s, path,
        emb.filter(pmod(col("vec_id"), lit(2)) === 0),
        "vec_id", "embedding", cent, model)
      graft.ops.PqIndex.append(s, path,
        emb.filter(pmod(col("vec_id"), lit(2)) === 1),
        "vec_id", "embedding")
      val out = graft.ops.PqIndex.topK(s, path,
          emb.filter(col("vec_id") % 50 === 0), "vec_id", "embedding",
          k = 5, candidateK = 20, nprobe = 3)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          (round(col("cos"), 4) + lit(0.0)).as("cos"))
        .localCheckpoint(true) // materialize before the tree is deleted
      try {
        val pp = new org.apache.hadoop.fs.Path(path)
        pp.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(pp, true)
      } catch { case _: Exception => () }
      out
    }),

    // Tombstone deletes on the persisted IVF-PQ index — the last of the
    // four persisted families to get the delete life cycle (deletes
    // need no refit: removing rows leaves every stored code and both
    // codebooks valid; appends encode under the frozen codebooks).
    // BRANCH the shared tree (hard-linked snapshot — no rebuild, no
    // contact with what q_ann_ivfpq_persist reads), tombstone every
    // vec_id ≡ 3 (mod 7), probe: the mask lands BEFORE the ADC
    // candidateK cut, so the result EXACTLY equals a probe of a
    // survivors-only build under the SAME codebooks — which is what
    // the oracle computes (ivfPqTopkSql with the survivor filter on
    // the stored lists; model fit and centroids stay full-corpus, the
    // codebooks existed before the delete). Compact/fold is spec-gated
    // (PqIndexSpec).
    "q_ann_ivfpq_delete" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_pqidx_del_" +
        new java.io.File(dir).getName + "_" + s.sparkContext.applicationId
      graft.ops.PqIndex.branch(s, sharedPqPath(s, dir), path)
      graft.ops.PqIndex.delete(s, path,
        emb.filter(pmod(col("vec_id"), lit(7)) === 3).select(col("vec_id")),
        "vec_id")
      val out = graft.ops.PqIndex.topK(s, path,
          emb.filter(col("vec_id") % 50 === 0), "vec_id", "embedding",
          k = 5, candidateK = 20, nprobe = 3)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          (round(col("cos"), 4) + lit(0.0)).as("cos"))
        .localCheckpoint(true) // materialize before the branch is deleted
      try {
        val pp = new org.apache.hadoop.fs.Path(path)
        pp.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(pp, true)
      } catch { case _: Exception => () }
      out
    }),

    // Delete → COMPACT → probe on the IVF-PQ index: compact folds the
    // mask into a fresh generation (survivor lists rewritten, centroids
    // and model CLONED — deletes must not move surviving codes), after
    // which the probe must STILL equal the survivors-only build — the
    // oracle is q_ann_ivfpq_delete's verbatim, so a compact that
    // dropped the wrong rows, re-quantized, or lost the model fails the
    // same hash the mask passed.
    "q_ann_ivfpq_compact" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_pqidx_cpt_" +
        new java.io.File(dir).getName + "_" + s.sparkContext.applicationId
      graft.ops.PqIndex.branch(s, sharedPqPath(s, dir), path)
      graft.ops.PqIndex.delete(s, path,
        emb.filter(pmod(col("vec_id"), lit(7)) === 3).select(col("vec_id")),
        "vec_id")
      graft.ops.PqIndex.compact(s, path)
      val out = graft.ops.PqIndex.topK(s, path,
          emb.filter(col("vec_id") % 50 === 0), "vec_id", "embedding",
          k = 5, candidateK = 20, nprobe = 3)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          (round(col("cos"), 4) + lit(0.0)).as("cos"))
        .localCheckpoint(true) // materialize before the branch is deleted
      try {
        val pp = new org.apache.hadoop.fs.Path(path)
        pp.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(pp, true)
      } catch { case _: Exception => () }
      out
    }),

    // DRIFT-triggered REFIT on the persisted IVF-PQ index — the ACTION
    // q_pq_drift's trigger alarms for, closing the freshness loop:
    // build the tree over the EVEN half with codebooks fit on the even
    // half only (the "stale" serving state), append the odd half under
    // those frozen codebooks (exact, but quantized against a half-
    // corpus fit), then PqIndex.refit — geometry inferred from the
    // stored model, coarse centroids cloned, codebooks RE-FIT on the
    // index's own live rows and every row re-encoded into a fresh
    // generation. Because the integer-exact Lloyd fit is value-keyed
    // (md5-of-id seeds) and order-independent, the refit model over the
    // read-back corpus is bit-identical to a full-corpus fit — so the
    // oracle is q_ann_ivfpq_persist's VERBATIM: stale build + append +
    // refit must equal the from-scratch full-fit build, codes and all.
    "q_ann_ivfpq_refit" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val even = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
      val staleModel = Pq.fit(even, "vec_id", "embedding",
        dims = 64, m = 4, k = 4, iterations = 2)
      val cent = emb.filter(col("embedding").isNotNull)
        .filter(pmod(col("vec_id"), lit(25)) === 0 &&
          col("vec_id") < 12500)
        .select(col("vec_id").as("centroid_id"),
          col("embedding").as("centroid"))
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_pqidx_rft_" +
        new java.io.File(dir).getName + "_" + s.sparkContext.applicationId
      graft.ops.PqIndex.write(s, path, even, "vec_id", "embedding",
        cent, staleModel)
      graft.ops.PqIndex.append(s, path,
        emb.filter(pmod(col("vec_id"), lit(2)) === 1),
        "vec_id", "embedding")
      graft.ops.PqIndex.refit(s, path, iterations = 2)
      val out = graft.ops.PqIndex.topK(s, path,
          emb.filter(col("vec_id") % 50 === 0), "vec_id", "embedding",
          k = 5, candidateK = 20, nprobe = 3)
        .select(col("query_id"), col("neighbor_id"), col("rank"),
          (round(col("cos"), 4) + lit(0.0)).as("cos"))
        .localCheckpoint(true) // materialize before the tree is deleted
      try {
        val pp = new org.apache.hadoop.fs.Path(path)
        pp.getFileSystem(s.sparkContext.hadoopConfiguration)
          .delete(pp, true)
      } catch { case _: Exception => () }
      out
    }),

    // NDCG@10 + MRR@10 per query — the ranking-eval layer for the
    // retrieval stack (BM25 / ANN / RRF): each source is a "query" whose
    // run ranks its docs by length, with graded relevance planted from
    // doc_id (0..3). Run prunes to rank<=10 first, labels join keyed,
    // ideal ordering is a per-query window over that query's own labels.
    "q_ndcg_mrr" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(col("n_chars").desc, col("doc_id").asc)
      val runs = docs.select(col("source"), col("doc_id"),
        row_number().over(w).cast("long").as("rank"))
      val labels = docs.select(col("source"), col("doc_id"),
        pmod(col("doc_id"), lit(4)).as("rel"))
      graft.ml.Ranking.ndcgMrrAtK(runs, labels,
        "source", "doc_id", "rank", "rel", k = 10)
    }),

    // Exact tie-aware AUC (Mann–Whitney) of document length as a
    // predictor of a planted source split — integer sufficient statistics
    // (p, n, auc_num_x2), AUC = auc_num_x2 / 2pn.
    "q_classifier_auc" -> ((s, dir) =>
      graft.ml.Eval.aucExact(Tables.documents(s, dir),
        col("n_chars"), length(col("source")) === 4)),

    // The continuous-score case: a per-row-unique double score
    // (|distinct| = n), which is exactly where a global-window rank
    // statistic degenerates into a single-partition sort. Gates the
    // range-tiled prefix-sum path at full distinct cardinality; the
    // sufficient statistics stay BIGINT-exact because the score never
    // reaches the output, only its ordering does (and double arithmetic
    // is IEEE-identical across engines for identical expressions).
    "q_auc_continuous" -> ((s, dir) =>
      graft.ml.Eval.aucExact(Tables.documents(s, dir),
        col("n_chars").cast("double") +
          col("doc_id").cast("double") / (col("doc_id").cast("double") + lit(1.0)),
        length(col("source")) === 4)),

    // The exact ROC curve: a (tp, fp, fn, tn) confusion matrix at EVERY
    // distinct-score threshold, via the same range-tiled descending
    // prefix sum — |distinct| output rows, all BIGINT, no global sort.
    "q_roc_points" -> ((s, dir) =>
      graft.ml.Eval.rocPoints(Tables.documents(s, dir),
        col("n_chars").cast("long"), length(col("source")) === 4)),

    // Exact average precision (PR-AUC) over a CONTINUOUS per-row-unique
    // score: each threshold term cp·tp/(tp+fp) is one IEEE divide+multiply
    // quantized to a 1e-9 grid BEFORE the global BIGINT sum, so the
    // reduction is order-independent and hash-stable cross-engine.
    "q_pr_auc" -> ((s, dir) =>
      graft.ml.Eval.averagePrecision(Tables.documents(s, dir),
        col("n_chars").cast("double") +
          col("doc_id").cast("double") / (col("doc_id").cast("double") + lit(1.0)),
        length(col("source")) === 4)),

    // Reliability table for a pseudo-probability ((doc_id % 997)/997):
    // 10 equal-width bins, per-bin counts BIGINT and score mass quantized
    // per row to a 1e-9 grid — ECE and reliability plots derive from it.
    "q_calibration" -> ((s, dir) =>
      graft.ml.Eval.calibrationBins(Tables.documents(s, dir),
        (col("doc_id") % 997).cast("double") / lit(997.0),
        length(col("source")) === 4, bins = 10)),

    // Cluster-balanced diversity sample (the D4/SemDeDup-era recipe):
    // k-means buckets the corpus, then Efraimidis–Spirakis weighted
    // sampling draws with weight 1/|cluster| — big clusters stop
    // dominating the sample. Pure composition: the exact k-means fit +
    // broadcast size join + the deterministic md5-seeded sampler.
    "q_cluster_sample" -> ((s, dir) => {
      val assign = KMeans.fitAssign(Tables.embeddings(s, dir),
          "vec_id", "embedding", k = 8, iterations = 3)
        .select(col("vec_id"), col("cluster"))
      val sizes = assign.groupBy("cluster").agg(count(lit(1)).as("csize"))
      val weighted = assign.join(broadcast(sizes), "cluster")
        .withColumn("w", lit(1.0) / col("csize").cast("double"))
      graft.ops.Sharding.weightedSample(weighted, "vec_id", "w", n = 64)
        .select(col("vec_id"), col("cluster"), col("csize"))
    }),

    // PCA sufficient statistics, oracle-checkable form: integer-quantized
    // centered-covariance numerators n·Σxy − Σx·Σy over the first 8 dims.
    // This pair-explode shape exists FOR the SQL oracle; the production
    // fit path is CovarianceAgg (one fixed-size buffer per partition, no
    // d² row blowup) — q_pca_project below exercises it.
    "q_pca_covariance" -> ((s, dir) => {
      val q = Tables.embeddings(s, dir)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "x")))
        .filter(col("dim") < 8)
        .select(col("vec_id"), col("dim").cast("int").as("dim"),
          floor(col("x").cast("double") * 10000).cast("long").as("qv"))
      val a = q.select(col("vec_id"), col("dim").as("dim_i"), col("qv").as("qa"))
      val b = q.select(col("vec_id"), col("dim").as("dim_j"), col("qv").as("qb"))
      a.join(b, Seq("vec_id")).filter(col("dim_i") <= col("dim_j"))
        .groupBy("dim_i", "dim_j")
        .agg(count(lit(1)).as("n"), sum(col("qa") * col("qb")).as("sxy"),
          sum(col("qa")).as("sx"), sum(col("qb")).as("sy"))
        .select(col("dim_i"), col("dim_j"),
          (col("n") * col("sxy") - col("sx") * col("sy")).as("cov_num"))
    }),

    // Full PCA serving path under a HASH gate via invariants: the float
    // eigenvectors themselves are not SQL-derivable, but every defining
    // property of a correct fit+projection is checkable to fixed
    // rounding — component orthonormality (PᵀP = I), score decorrelation
    // and centering, per-component score variance equal to its
    // eigenvalue, the Pythagoras split ‖y‖² + ‖r‖² = ‖x−μ‖², residual ⊥
    // reconstruction, eigenvalue ordering/positivity, and the dominant-
    // coordinate sign convention. A wrong Jacobi rotation, a dropped
    // centering term, or a bad component literal breaks at least one
    // row. The quantized total-variance trace is data-dependent, so the
    // oracle is tied to the actual table, not just constants.
    "q_pca_project" -> ((s, dir) => pcaInvariants(s, dir)))

  /** Builds the q_pca_project invariant table: fits k=4 components,
    * projects, reconstructs, and reduces everything to (stat, i, j, val,
    * qval) rows whose values are analytically known (0/1 after rounding)
    * plus the quantized trace. Collects only model-sized scalars.
    */
  private def pcaInvariants(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val k = 4
    val emb = Tables.embeddings(s, dir)
    val model = graft.ml.Pca.fit(emb, "embedding", k)
    val proj = graft.ml.Pca.project(
      emb.select(col("vec_id"), col("embedding")), "embedding", model)
      .localCheckpoint(false) // feeds both the score and residual passes

    // Pass 1: score moments — Σyᵢ, Σyᵢyⱼ (k(k+3)/2 scalars).
    val pairIdx = (for (i <- 0 until k; j <- i until k) yield (i, j)).toIndexedSeq
    val pairCols =
      (0 until k).map(i => sum(col(s"pc$i")).as(s"s$i")) ++
        pairIdx.map { case (i, j) =>
          sum(col(s"pc$i") * col(s"pc$j")).as(s"p${i}_$j")
        }
    val mRow = proj.agg(pairCols.head, pairCols.tail: _*).head()
    val n = proj.count().toDouble
    def sy(i: Int): Double = mRow.getDouble(i)
    def syy(i: Int, j: Int): Double =
      mRow.getDouble(k + pairIdx.indexOf(if (i <= j) (i, j) else (j, i)))

    // Pass 2: reconstruction — explode dims, rebuild x̂ = Σ yᵢPᵢ through
    // literal components, reduce to 4 scalars.
    val meanLit = lit(model.mean)
    val recon = (0 until k)
      .map(i => col(s"pc$i") * element_at(lit(model.components(i)), col("dim") + 1))
      .reduce(_ + _)
    val rRow = proj
      .select((0 until k).map(i => col(s"pc$i")) :+
        posexplode(col("embedding")).as(Seq("dim", "x")): _*)
      .select(
        (col("x").cast("double") - element_at(meanLit, col("dim") + 1)).as("xc"),
        recon.as("rec"))
      .select(col("xc"), col("rec"), (col("xc") - col("rec")).as("r"))
      .agg(sum(col("xc") * col("xc")).as("sxc2"), sum(col("r") * col("r")).as("sr2"),
        sum(col("r") * col("rec")).as("srrec"), sum(col("rec") * col("rec")).as("srec2"))
      .head()
    val (sxc2, sr2, srrec, srec2) =
      (rRow.getDouble(0), rRow.getDouble(1), rRow.getDouble(2), rRow.getDouble(3))

    // Pass 3: data-dependent quantized trace numerator Σ_d (n·Σq² − (Σq)²)
    // — the same ×10⁴ integer quantization as q_pca_covariance, exact on
    // both engines.
    val traceQ = emb
      .select(posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("dim"),
        floor(col("x").cast("double") * 10000).cast("long").as("qv"))
      .groupBy("dim")
      .agg(count(lit(1)).as("cnt"), sum(col("qv") * col("qv")).as("sxx"),
        sum(col("qv")).as("sx"))
      .agg(sum(col("cnt") * col("sxx") - col("sx") * col("sx")).as("t"))
      .head().getLong(0)

    def rnd(v: Double, digits: Int): Double =
      BigDecimal(v).setScale(digits, BigDecimal.RoundingMode.HALF_UP).toDouble
    // Degenerate-data guard (rank <= k, constant columns, zero residual):
    // a 0/0 ratio whose NUMERATOR is also exactly 0 means the invariant
    // holds trivially, so emit the expected value; a nonzero numerator
    // over a zero denominator is a genuine violation — emit a sentinel
    // that fails the gate loudly instead of crashing rnd() on NaN.
    def ratio(num: Double, den: Double, whenTrivial: Double, digits: Int): Double =
      if (den != 0.0) rnd(num / den, digits)
      else if (num == 0.0) whenTrivial
      else 9.0
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum

    val rows =
      pairIdx.map { case (i, j) =>
        ("comp_dot", i, j,
          rnd(dot(model.components(i), model.components(j)), 6), 0L)
      } ++
      (for (i <- 0 until k; j <- (i + 1) until k) yield
        ("score_corr", i, j,
          ratio(syy(i, j), math.sqrt(syy(i, i) * syy(j, j)),
            whenTrivial = 0.0, 4), 0L)) ++
      (0 until k).map(i => ("score_center", i, -1, rnd(sy(i) / n, 5), 0L)) ++
      (0 until k).map(i =>
        ("score_var", i, -1,
          ratio(syy(i, i), n * model.eigenvalues(i), whenTrivial = 1.0, 5),
          0L)) ++
      (0 until k - 1).map(i =>
        ("eig_order", i, -1,
          if (model.eigenvalues(i) >= model.eigenvalues(i + 1)) 1.0 else 0.0,
          0L)) ++
      Seq(("eig_nonneg", -1, -1,
        if (model.eigenvalues.forall(_ >= 0.0)) 1.0 else 0.0, 0L)) ++
      (0 until k).map { i =>
        val v = model.components(i)
        // Same dominant-coordinate scan as Pca.fit: strict >, so ties
        // keep the FIRST index (zipWithIndex.max would take the last).
        var best = 0
        var bi = 1
        while (bi < v.length) {
          if (math.abs(v(bi)) > math.abs(v(best))) best = bi
          bi += 1
        }
        ("comp_sign", i, -1, if (v(best) > 0) 1.0 else 0.0, 0L)
      } ++
      Seq(
        ("recon_ratio", -1, -1,
          ratio(srec2 + sr2, sxc2, whenTrivial = 1.0, 6), 0L),
        ("resid_orth", -1, -1,
          ratio(srrec, math.sqrt(sr2 * srec2), whenTrivial = 0.0, 4), 0L),
        ("trace_q", -1, -1, 0.0, traceQ))
    rows.toDF("stat", "i", "j", "val", "qval")
  }

  // ---- oracle: a reusable unrolled Lloyd chain -----------------------
  // The same recurrence KMeans.fit runs, restated in DuckDB CTEs:
  // quantize → seed by md5 order → iters × (argmin assign, floor-divided
  // centroid update) → final assignment with exact squared distance.
  // list_dot_product over integer-valued doubles is exact, so accumulation
  // order can't split the engines; floor(sum/count) matches Spark's
  // floor(sum/count) on identical IEEE doubles. `p` prefixes every CTE so
  // product quantization can instantiate one chain per subspace.

  private def lloydAssign(p: String, name: String, cents: String): String =
    s"""$name AS (
       |  SELECT vec_id, v, c FROM (
       |    SELECT ${p}q.vec_id, ${p}q.v, $cents.c,
       |      row_number() OVER (PARTITION BY ${p}q.vec_id ORDER BY
       |        list_dot_product($cents.v, $cents.v)
       |          - 2 * list_dot_product(${p}q.v, $cents.v), $cents.c) AS rn
       |    FROM ${p}q CROSS JOIN $cents) WHERE rn = 1)""".stripMargin

  private def lloydUpdate(p: String, i: Int, dim: Int): String =
    s"""${p}u$i AS (
       |  SELECT c, i, floor(sum(v[i]) / count(*)) AS cv
       |  FROM ${p}a$i, range(1, ${dim + 1}) t(i) GROUP BY c, i),
       |${p}c$i AS (
       |  SELECT ${p}c${i - 1}.c, coalesce(u.v, ${p}c${i - 1}.v) AS v
       |  FROM ${p}c${i - 1} LEFT JOIN
       |    (SELECT c, list(cv ORDER BY i) AS v FROM ${p}u$i GROUP BY c) u
       |    USING (c))""".stripMargin

  /** Full chain `{p}q → {p}c0 → … → {p}af`; `{p}af` has
    * (vec_id, c, dist) with `dist` the exact squared quantized distance.
    */
  private def lloydChain(p: String, vecSql: String, dim: Int, k: Int,
      iters: Int, where: String = ""): String = {
    val rounds = (1 to iters)
      .map(i => lloydAssign(p, s"${p}a$i", s"${p}c${i - 1}") + ",\n" +
        lloydUpdate(p, i, dim))
      .mkString(",\n")
    val fc = s"${p}c$iters"
    s"""${p}q AS (
       |  SELECT vec_id, $vecSql AS v
       |  FROM embeddings WHERE embedding IS NOT NULL$where),
       |${p}c0 AS (
       |  SELECT c, v FROM (
       |    SELECT row_number() OVER
       |      (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS c, v
       |    FROM ${p}q) WHERE c < $k),
       |$rounds,
       |${p}af AS (
       |  SELECT vec_id, c, list_dot_product(v, v) + sc AS dist FROM (
       |    SELECT ${p}q.vec_id, ${p}q.v, $fc.c,
       |      list_dot_product($fc.v, $fc.v)
       |        - 2 * list_dot_product(${p}q.v, $fc.v) AS sc,
       |      row_number() OVER (PARTITION BY ${p}q.vec_id ORDER BY
       |        list_dot_product($fc.v, $fc.v)
       |          - 2 * list_dot_product(${p}q.v, $fc.v), $fc.c) AS rn
       |    FROM ${p}q CROSS JOIN $fc) WHERE rn = 1)""".stripMargin
  }

  private def quantSql(inner: String): String =
    s"list_transform($inner, x -> floor(CAST(x AS DOUBLE) * 1000))"

  private val kmeansSql: String =
    s"""WITH ${lloydChain("", quantSql("embedding"), 64, 8, 3)}
       |SELECT vec_id, CAST(c AS INT) AS cluster, CAST(dist AS BIGINT) AS dist
       |FROM af""".stripMargin

  // Same k-means chain, same 1/|cluster| weights, same ES key ordering —
  // the sampler's ln(u)/w arithmetic mirrors Sharding.weightedSample
  // operation-for-operation (weight built as ONE division, then the key
  // as ln(u) / w, never algebraically fused to ln(u)·|cluster|).
  private val clusterSampleSql: String =
    s"""WITH ${lloydChain("", quantSql("embedding"), 64, 8, 3)},
       |a AS (SELECT vec_id, c FROM af),
       |sz AS (SELECT c, count(*) AS csize FROM a GROUP BY c),
       |w AS (
       |  SELECT a.vec_id, a.c, sz.csize,
       |    ln((CAST(('0x' || substr(md5(CAST(a.vec_id AS VARCHAR)), 1, 15))
       |        AS BIGINT) + 1) / 1152921504606846976.0)
       |      / (1.0 / CAST(sz.csize AS DOUBLE)) AS k
       |  FROM a JOIN sz USING (c))
       |SELECT vec_id, CAST(c AS INT) AS cluster, CAST(csize AS BIGINT) AS csize
       |FROM w ORDER BY k DESC, vec_id LIMIT 64""".stripMargin

  /** Replays [[graft.ml.Pq.quantizationDrift]] with the model fit on
    * the even half: 4 per-subspace Lloyd chains over `vec_id % 2 = 0`
    * (lloydChain's `where`), then every vector of the FULL corpus
    * assigned to its nearest final centroid per subspace (exact
    * integer-grid distances, the engine's recon_dist), summed across
    * subspaces and aggregated per cohort.
    */
  private val pqDriftSql: String = {
    val m = 4; val subDim = 16
    val chains = (0 until m).map { s =>
      lloydChain(s"s${s}_",
        quantSql(s"list_slice(embedding, ${s * subDim + 1}, ${(s + 1) * subDim})"),
        subDim, 4, 2, where = " AND vec_id % 2 = 0")
    }.mkString(",\n")
    val assigns = (0 until m).map { s =>
      s"""full$s AS (
         |  SELECT vec_id,
         |    ${quantSql(s"list_slice(embedding, ${s * subDim + 1}, ${(s + 1) * subDim})")} AS v
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |d$s AS (
         |  SELECT vec_id, dist FROM (
         |    SELECT f.vec_id,
         |      list_dot_product(f.v, f.v) + list_dot_product(c.v, c.v)
         |        - 2 * list_dot_product(f.v, c.v) AS dist,
         |      row_number() OVER (PARTITION BY f.vec_id ORDER BY
         |        list_dot_product(c.v, c.v) - 2 * list_dot_product(f.v, c.v),
         |        c.c) AS rn
         |    FROM full$s f CROSS JOIN s${s}_c2 c) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH $chains,
       |$assigns,
       |tot AS (
       |  SELECT d0.vec_id, d0.dist + d1.dist + d2.dist + d3.dist AS err
       |  FROM d0 JOIN d1 USING (vec_id) JOIN d2 USING (vec_id)
       |    JOIN d3 USING (vec_id)),
       |agg AS (SELECT
       |  CAST(count(CASE WHEN vec_id % 2 = 0 THEN 1 END) AS BIGINT) AS build_n,
       |  CAST(sum(CASE WHEN vec_id % 2 = 0 THEN err END) AS BIGINT) AS build_err,
       |  CAST(count(CASE WHEN vec_id % 2 = 1 THEN 1 END) AS BIGINT) AS delta_n,
       |  CAST(sum(CASE WHEN vec_id % 2 = 1 THEN err END) AS BIGINT) AS delta_err
       |  FROM tot)
       |SELECT build_n, build_err, delta_n, delta_err,
       |  round((CAST(delta_err AS DOUBLE) / CAST(delta_n AS DOUBLE))
       |    / (CAST(build_err AS DOUBLE) / CAST(build_n AS DOUBLE)), 4)
       |    AS drift_ratio
       |FROM agg""".stripMargin
  }

  private val pqSql: String = {
    val m = 4; val subDim = 16
    val chains = (0 until m).map { s =>
      lloydChain(s"s${s}_",
        quantSql(s"list_slice(embedding, ${s * subDim + 1}, ${(s + 1) * subDim})"),
        subDim, 4, 2)
    }.mkString(",\n")
    val codes = (0 until m).map(s => s"CAST(s${s}_af.c AS INT)").mkString(", ")
    val dist = (0 until m).map(s => s"s${s}_af.dist").mkString(" + ")
    val joins = (1 until m)
      .map(s => s"JOIN s${s}_af ON s${s}_af.vec_id = s0_af.vec_id").mkString("\n")
    s"""WITH $chains
       |SELECT s0_af.vec_id, array_to_string([$codes], '-') AS pq_code,
       |  CAST($dist AS BIGINT) AS recon_dist
       |FROM s0_af
       |$joins""".stripMargin
  }

  /** Shared ADC oracle skeleton. `extraCtes` (if any) are injected before
    * the candidate CTE; `candJoin` adds a restriction join inside it —
    * the composition seam `q_ivf_pq_topk` uses to route candidates
    * through the IVF fragment.
    */
  /** EM trajectory unrolled: same planted pair construction, same
    * left-associated responsibility product, same 1e-9 quantization
    * before every integer M-step sum, same clamps — bit-identical params
    * per round.
    */
  private val fsLinkageSql: String = {
    val fields = Seq("g_name", "g_seg", "g_bal")
    def prod(lead: String, ps: Seq[String]): String =
      fields.zip(ps).foldLeft(lead) { case (acc, (g, p)) =>
        s"$acc * (CASE WHEN $g THEN $p ELSE 1 - $p END)"
      }
    def wRound(r: Int, lam: String, ms: Seq[String], us: Seq[String]) = {
      val num = prod(lam, ms)
      val alt = prod(s"(1 - $lam)", us)
      s"""w$r AS (
         |  SELECT g.*, CAST(floor(($num) / (($num) + ($alt)) * 1e9)
         |    AS BIGINT) AS wq
         |  FROM g${if (r == 1) "" else s", p${r - 1}"})"""
        .stripMargin
    }
    def sRound(r: Int) = {
      val per = fields.zipWithIndex.map { case (g, i) =>
        s"""    sum(CASE WHEN $g THEN wq ELSE 0 END) AS swg${i + 1},
           |    sum(CASE WHEN $g THEN 1000000000 - wq ELSE 0 END) AS sug${i + 1}"""
          .stripMargin
      }.mkString(",\n")
      s"""s$r AS (
         |  SELECT CAST(sum(wq) AS BIGINT) AS sw,
         |    CAST(sum(1000000000 - wq) AS BIGINT) AS su,
         |    count(*) AS n,
         |$per
         |  FROM w$r)""".stripMargin
    }
    def clamp(x: String) =
      s"least(CAST(0.999999 AS DOUBLE), greatest(1e-6, $x))"
    def pRound(r: Int) = {
      val per = fields.indices.map { i =>
        s"""    CASE WHEN sw = 0 THEN 1e-6
           |      ELSE ${clamp(s"CAST(swg${i + 1} AS DOUBLE) / CAST(sw AS DOUBLE)")} END AS m${i + 1},
           |    CASE WHEN su = 0 THEN 1e-6
           |      ELSE ${clamp(s"CAST(sug${i + 1} AS DOUBLE) / CAST(su AS DOUBLE)")} END AS u${i + 1}"""
          .stripMargin
      }.mkString(",\n")
      s"""p$r AS (
         |  SELECT ${clamp("CAST(sw AS DOUBLE) / 1e9 / CAST(n AS DOUBLE)")} AS lam,
         |$per
         |  FROM s$r)""".stripMargin
    }
    // Init literals MUST be DOUBLE: bare 0.3/0.9 parse as DECIMAL in
    // DuckDB and the first round would run in exact decimal arithmetic,
    // diverging from the Spark side's IEEE doubles.
    val d = (x: String) => s"CAST($x AS DOUBLE)"
    val r1 = Seq(
      wRound(1, d("0.3"), Seq.fill(3)(d("0.9")), Seq.fill(3)(d("0.2"))),
      sRound(1), pRound(1))
    val rs = (2 to 3).flatMap(r => Seq(
      wRound(r, "lam", (1 to 3).map(i => s"m$i"), (1 to 3).map(i => s"u$i")),
      sRound(r), pRound(r)))
    val finals = fields.zipWithIndex.map { case (g, i) =>
      s"""SELECT '$g' AS field, round(m${i + 1}, 6) AS m,
         |  round(u${i + 1}, 6) AS u,
         |  round(ln(m${i + 1} / u${i + 1}) / ln(2.0), 6) AS weight,
         |  round(lam, 6) AS lambda FROM p3""".stripMargin
    }.mkString("\nUNION ALL ")
    s"""WITH c AS (
       |  SELECT c_custkey AS k, c_name, c_mktsegment, c_acctbal
       |  FROM customer),
       |b AS (
       |  SELECT k,
       |    CASE WHEN (k % 2 = 0 AND k % 10 <> 0)
       |        OR (k % 2 <> 0 AND k % 20 = 0) THEN c_name
       |      ELSE c_name || '~' END AS name_b,
       |    CASE WHEN (k % 2 = 0 AND k % 7 <> 0)
       |        OR (k % 2 <> 0 AND k % 5 = 0) THEN c_mktsegment
       |      ELSE c_mktsegment || '~' END AS seg_b,
       |    CASE WHEN (k % 2 = 0 AND k % 3 <> 0)
       |        OR (k % 2 <> 0 AND k % 4 = 0) THEN c_acctbal
       |      ELSE c_acctbal + 1 END AS bal_b
       |  FROM c),
       |g AS (
       |  SELECT c.c_name = b.name_b AS g_name,
       |    c.c_mktsegment = b.seg_b AS g_seg,
       |    c.c_acctbal = b.bal_b AS g_bal
       |  FROM c JOIN b USING (k)),
       |${(r1 ++ rs).mkString(",\n")}
       |$finals""".stripMargin
  }

  private def pqAdcSql(finalSelect: String, extraCtes: String = "",
      candJoin: String = ""): String = {
    val m = 4; val subDim = 16
    val chains = (0 until m).map { s =>
      lloydChain(s"s${s}_",
        quantSql(s"list_slice(embedding, ${s * subDim + 1}, ${(s + 1) * subDim})"),
        subDim, 4, 2)
    }.mkString(",\n")
    // Probe distance tables: |p_s|² + |c|² − 2·p_s·c per (probe, centroid).
    val tables = (0 until m).map { s =>
      s"""pr$s AS (
         |  SELECT q.vec_id AS query_id, cc.c,
         |    list_dot_product(q.v, q.v) + list_dot_product(cc.v, cc.v)
         |      - 2 * list_dot_product(q.v, cc.v) AS d
         |  FROM s${s}_q q CROSS JOIN s${s}_c2 cc WHERE q.vec_id % 50 = 0)"""
        .stripMargin
    }.mkString(",\n")
    val codeJoins = (1 until m)
      .map(s => s"  JOIN s${s}_af a$s ON a$s.vec_id = a0.vec_id").mkString("\n")
    val tabJoins = (0 until m).map { s =>
      val qj = if (s == 0) "" else s" AND p$s.query_id = p0.query_id"
      s"  JOIN pr$s p$s ON p$s.c = a$s.c$qj"
    }.mkString("\n")
    val dist = (0 until m).map(s => s"p$s.d").mkString(" + ")
    val extra = if (extraCtes.isEmpty) "" else s"\n$extraCtes,"
    val restrict = if (candJoin.isEmpty) "" else s"\n$candJoin"
    s"""WITH $chains,
       |$tables,$extra
       |cand AS (
       |  SELECT p0.query_id, a0.vec_id AS neighbor_id, $dist AS adc
       |  FROM s0_af a0
       |$codeJoins
       |$tabJoins$restrict
       |  WHERE p0.query_id <> a0.vec_id),
       |r AS (SELECT *, row_number() OVER
       |  (PARTITION BY query_id ORDER BY adc, neighbor_id) AS rn FROM cand)
       |$finalSelect""".stripMargin
  }

  // Greedy max-min unrolled: pick r's candidate distance is the least of
  // its distances to picks 0..r-1; argmax with (dm DESC, vec_id ASC).
  private val fpsSql: String = {
    val k = 5
    def dist(cv: String): String =
      s"""list_dot_product(q.v, q.v) - 2 * list_dot_product(q.v, $cv)
         |      + list_dot_product($cv, $cv)""".stripMargin
    val rounds = (1 until k).map { r =>
      val froms = (0 until r).map(i => s"c$i").mkString(", ")
      val dm = (0 until r).map(i => dist(s"c$i.v")).mkString("least(", ",\n    ", ")")
      s"""d$r AS (
         |  SELECT q.vec_id, q.v, $dm AS dm
         |  FROM q, $froms),
         |c$r AS (SELECT vec_id, v, dm FROM d$r ORDER BY dm DESC, vec_id LIMIT 1)"""
        .stripMargin
    }.mkString(",\n")
    val finals = (s"SELECT 0 AS round, vec_id, CAST(0 AS BIGINT) AS dist FROM c0" +:
      (1 until k).map(r =>
        s"SELECT $r, vec_id, CAST(dm AS BIGINT) FROM c$r")).mkString("\nUNION ALL ")
    s"""WITH q AS (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> floor(CAST(x AS DOUBLE) * 1000)) AS v
       |  FROM embeddings WHERE embedding IS NOT NULL),
       |c0 AS (
       |  SELECT vec_id, v FROM q
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 1),
       |$rounds
       |$finals""".stripMargin
  }

  // Same 8x3 Lloyd chain as q_kmeans for the cluster assignment; cosine
  // and the keep-first arbitration restated over same-cluster pairs.
  private val semdedupSql: String =
    s"""WITH ${lloydChain("", quantSql("embedding"), 64, 8, 3)},
       |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
       |      WHERE embedding IS NOT NULL),
       |sh AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM af a JOIN af b ON a.c = b.c AND a.vec_id < b.vec_id
       |  JOIN e ea ON ea.vec_id = a.vec_id
       |  JOIN e eb ON eb.vec_id = b.vec_id
       |  WHERE list_cosine_similarity(ea.v, eb.v) > 0.4)
       |SELECT af.vec_id, CAST(af.c AS INT) AS cluster,
       |  (sh.vec_id IS NULL) AS kept
       |FROM af LEFT JOIN sh ON sh.vec_id = af.vec_id""".stripMargin

  // IVF routing (the q_ann_ivf_topk fragment, probe set aligned with
  // the ADC probes) restricts the ADC candidate CTE; rerank reuses the
  // fragment's own `e` table. Shared verbatim by q_ivf_pq_topk and
  // q_ann_ivfpq_persist (the persisted artifact adds no math);
  // q_ann_ivfpq_delete adds ONLY the survivor filter on the stored
  // lists — model fit and centroids stay full-corpus, because the
  // codebooks existed before the delete and a pure-mask delete must
  // not move them.
  private def ivfPqTopkSqlOf(survWhere: String): String = pqAdcSql(
      finalSelect =
        """, cnd AS (SELECT query_id, neighbor_id FROM r WHERE rn <= 20),
          |rr AS (
          |  SELECT c.query_id, c.neighbor_id,
          |    list_cosine_similarity(a.v, b.v) AS cos,
          |    CAST(row_number() OVER (PARTITION BY c.query_id
          |      ORDER BY list_cosine_similarity(a.v, b.v) DESC,
          |        c.neighbor_id ASC) AS INT) AS rank
          |  FROM cnd c
          |  JOIN e a ON a.vec_id = c.query_id
          |  JOIN e b ON b.vec_id = c.neighbor_id)
          |SELECT query_id, neighbor_id, rank, round(cos, 4) + 0.0 AS cos
          |FROM rr WHERE rank <= 5""".stripMargin,
      extraCtes =
        s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
          |     WHERE embedding IS NOT NULL),
          |cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % 25 = 0 AND vec_id < 12500),
          |assign AS (
          |  SELECT a.vec_id, c.cid,
          |    row_number() OVER (PARTITION BY a.vec_id
          |      ORDER BY list_cosine_similarity(a.v, c.cv) DESC, c.cid ASC) AS r
          |  FROM e a CROSS JOIN cent c),
          |lists AS (SELECT cid AS list, vec_id AS neighbor_id
          |  FROM assign WHERE r = 1$survWhere),
          |pa AS (
          |  SELECT a.vec_id AS query_id, c.cid,
          |    row_number() OVER (PARTITION BY a.vec_id
          |      ORDER BY list_cosine_similarity(a.v, c.cv) DESC, c.cid ASC) AS r
          |  FROM e a CROSS JOIN cent c WHERE a.vec_id % 50 = 0),
          |pl AS (SELECT query_id, cid AS list FROM pa WHERE r <= 3),
          |ivfcand AS (
          |  SELECT pl.query_id, l.neighbor_id
          |  FROM pl JOIN lists l ON pl.list = l.list
          |  WHERE pl.query_id <> l.neighbor_id)""".stripMargin,
      candJoin =
        "  JOIN ivfcand ic ON ic.query_id = p0.query_id" +
          " AND ic.neighbor_id = a0.vec_id")

  val oracles: Map[String, String] = Map(
    // Global row_number restates Ordinals' range-tiled order (both total:
    // sort key + id tiebreak); pairs at rank distance 1..3 per pass,
    // normalized to unordered and kept at the smallest distance.
    "q_snm_blocking" ->
      """WITH f AS (SELECT p_partkey, row_number() OVER
        |    (ORDER BY p_name, p_partkey) AS rn FROM part),
        |r AS (SELECT p_partkey, row_number() OVER
        |    (ORDER BY reverse(p_name), p_partkey) AS rn FROM part),
        |pf AS (SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
        |    CAST(b.rn - a.rn AS INT) AS w_dist
        |  FROM f a JOIN f b ON b.rn - a.rn BETWEEN 1 AND 3),
        |pr AS (SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
        |    CAST(b.rn - a.rn AS INT) AS w_dist
        |  FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND 3),
        |u AS (SELECT * FROM pf UNION ALL SELECT * FROM pr),
        |n AS (SELECT least(id_a, id_b) AS id_a,
        |    greatest(id_a, id_b) AS id_b, w_dist FROM u)
        |SELECT id_a, id_b, min(w_dist) AS w_dist,
        |  CAST(count(*) AS BIGINT) AS n_passes
        |FROM n GROUP BY 1, 2""".stripMargin,

    // Same group-then-window formulation: per distinct score (cp, cn),
    // cumulative negatives below, tie-aware numerator — all BIGINT.
    // Same graded-gain DCG (Järvelin–Kekäläinen), same total-order ideal
    // ranking, round(6) on dcg/idcg BEFORE the ndcg divide on both
    // engines (log2 ulps; <= 10-term sums sit far under the grid).
    "q_ndcg_mrr" ->
      """WITH runs AS (
        |  SELECT source AS q, doc_id AS d,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id ASC) AS rk
        |  FROM documents),
        |r10 AS (SELECT q, d, rk FROM runs WHERE rk <= 10),
        |lab AS (SELECT source AS q, doc_id AS d, doc_id % 4 AS rel
        |        FROM documents),
        |g AS (
        |  SELECT r10.q, r10.rk, coalesce(lab.rel, 0) AS rel,
        |    (power(2, coalesce(lab.rel, 0)) - 1) / log2(rk + 1) AS term
        |  FROM r10 LEFT JOIN lab ON r10.q = lab.q AND r10.d = lab.d),
        |dcg AS (
        |  SELECT q, count(*) AS n_ranked,
        |    CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_rel,
        |    round(sum(term), 6) AS dcg,
        |    round(max(CASE WHEN rel > 0 THEN 1.0 / rk END), 6) AS mrr0
        |  FROM g GROUP BY q),
        |il AS (
        |  SELECT q, rel, row_number() OVER (PARTITION BY q
        |    ORDER BY rel DESC, d ASC) AS irk
        |  FROM lab WHERE rel > 0),
        |idcg AS (
        |  SELECT q, round(sum((power(2, rel) - 1) / log2(irk + 1)), 6)
        |    AS idcg
        |  FROM il WHERE irk <= 10 GROUP BY q)
        |SELECT dcg.q AS query_id, n_ranked, n_rel, dcg,
        |  coalesce(idcg, 0.0) AS idcg,
        |  CASE WHEN coalesce(idcg, 0.0) > 0
        |    THEN round(dcg / idcg, 6) ELSE 0.0 END AS ndcg,
        |  coalesce(mrr0, 0.0) AS mrr
        |FROM dcg LEFT JOIN idcg ON dcg.q = idcg.q""".stripMargin,

    "q_classifier_auc" ->
      """WITH t AS (
        |  SELECT n_chars AS s,
        |    CASE WHEN length(source) = 4 THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |g AS (
        |  SELECT s, CAST(sum(y) AS BIGINT) AS cp,
        |    CAST(sum(1 - y) AS BIGINT) AS cn
        |  FROM t GROUP BY s),
        |c AS (
        |  SELECT cp, cn,
        |    CAST(coalesce(sum(cn) OVER (ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS nb
        |  FROM g)
        |SELECT CAST(sum(cp) AS BIGINT) AS p, CAST(sum(cn) AS BIGINT) AS n,
        |  CAST(sum(cp * (2 * nb + cn)) AS BIGINT) AS auc_num_x2
        |FROM c""".stripMargin,

    // Continuous twin: same Mann–Whitney restatement over a per-row-
    // unique double score (n_chars + doc_id/(doc_id+1)); identical IEEE
    // expressions on both engines, BIGINT outputs.
    "q_auc_continuous" ->
      """WITH t AS (
        |  SELECT CAST(n_chars AS DOUBLE)
        |      + CAST(doc_id AS DOUBLE) / (CAST(doc_id AS DOUBLE) + 1.0) AS s,
        |    CASE WHEN length(source) = 4 THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |g AS (
        |  SELECT s, CAST(sum(y) AS BIGINT) AS cp,
        |    CAST(sum(1 - y) AS BIGINT) AS cn
        |  FROM t GROUP BY s),
        |c AS (
        |  SELECT cp, cn,
        |    CAST(coalesce(sum(cn) OVER (ORDER BY s
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS nb
        |  FROM g)
        |SELECT CAST(sum(cp) AS BIGINT) AS p, CAST(sum(cn) AS BIGINT) AS n,
        |  CAST(sum(cp * (2 * nb + cn)) AS BIGINT) AS auc_num_x2
        |FROM c""".stripMargin,

    // Descending inclusive cumulative sums over the distinct-score frame:
    // tp/fp at each threshold, fn/tn from the totals — pure BIGINT.
    "q_roc_points" ->
      """WITH t AS (
        |  SELECT CAST(n_chars AS BIGINT) AS s,
        |    CASE WHEN length(source) = 4 THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |g AS (
        |  SELECT s, CAST(sum(y) AS BIGINT) AS cp,
        |    CAST(sum(1 - y) AS BIGINT) AS cn
        |  FROM t GROUP BY s),
        |c AS (
        |  SELECT s,
        |    CAST(sum(cp) OVER (ORDER BY s DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
        |    CAST(sum(cn) OVER (ORDER BY s DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fp
        |  FROM g),
        |tot AS (
        |  SELECT CAST(sum(cp) AS BIGINT) AS p, CAST(sum(cn) AS BIGINT) AS n
        |  FROM g)
        |SELECT c.s AS thr, c.tp, c.fp,
        |  tot.p - c.tp AS fn, tot.n - c.fp AS tn
        |FROM c, tot""".stripMargin,

    // Same threshold frame over the continuous score; each AP term is the
    // identical IEEE divide+multiply chain floored onto a 1e-9 grid, so
    // the final reduction is an order-independent BIGINT sum.
    "q_pr_auc" ->
      """WITH t AS (
        |  SELECT CAST(n_chars AS DOUBLE)
        |      + CAST(doc_id AS DOUBLE) / (CAST(doc_id AS DOUBLE) + 1.0) AS s,
        |    CASE WHEN length(source) = 4 THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |g AS (
        |  SELECT s, CAST(sum(y) AS BIGINT) AS cp,
        |    CAST(sum(1 - y) AS BIGINT) AS cn
        |  FROM t GROUP BY s),
        |c AS (
        |  SELECT cp,
        |    CAST(sum(cp) OVER (ORDER BY s DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
        |    CAST(sum(cn) OVER (ORDER BY s DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fp
        |  FROM g)
        |SELECT CAST(sum(cp) AS BIGINT) AS p,
        |  CAST(sum(CAST(floor(CAST(cp AS DOUBLE)
        |    * (CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE))
        |    * 1e9) AS BIGINT)) AS BIGINT) AS ap_num_q
        |FROM c""".stripMargin,

    // Equal-width reliability bins; per-row 1e-9 quantization BEFORE the
    // per-bin sum keeps the score mass an exact BIGINT on both engines.
    "q_calibration" ->
      """WITH t AS (
        |  SELECT CAST(doc_id % 997 AS DOUBLE) / 997.0 AS pr,
        |    CASE WHEN length(source) = 4 THEN 1 ELSE 0 END AS y
        |  FROM documents)
        |SELECT CAST(least(floor(pr * 10), 9) AS BIGINT) AS bin,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(y) AS BIGINT) AS pos,
        |  CAST(sum(CAST(floor(pr * 1e9) AS BIGINT)) AS BIGINT) AS prob_sum_q
        |FROM t GROUP BY 1""".stripMargin,

    // Same quantization (floor of an exact float→double widening ×10⁴),
    // same pair join, all-BIGINT arithmetic — bit-identical numerators.
    "q_pca_covariance" ->
      """WITH q0 AS (
        |  SELECT vec_id,
        |    CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
        |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000) AS BIGINT) AS qv
        |  FROM embeddings),
        |q AS (SELECT * FROM q0 WHERE dim < 8)
        |SELECT a.dim AS dim_i, b.dim AS dim_j,
        |  CAST(count(*) * sum(a.qv * b.qv) - sum(a.qv) * sum(b.qv) AS BIGINT)
        |    AS cov_num
        |FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.dim <= b.dim
        |GROUP BY 1, 2""".stripMargin,
    // The invariant suite's expected values are analytic (0/1 at the
    // stated rounding); the trace row is computed from the table with
    // the same integer quantization the Spark side uses.
    "q_pca_project" -> {
      val k = 4
      val expect =
        (for (i <- 0 until k; j <- i until k) yield
          ("comp_dot", i, j, if (i == j) "1.0" else "0.0")) ++
        (for (i <- 0 until k; j <- (i + 1) until k) yield
          ("score_corr", i, j, "0.0")) ++
        (0 until k).map(i => ("score_center", i, -1, "0.0")) ++
        (0 until k).map(i => ("score_var", i, -1, "1.0")) ++
        (0 until k - 1).map(i => ("eig_order", i, -1, "1.0")) ++
        Seq(("eig_nonneg", -1, -1, "1.0")) ++
        (0 until k).map(i => ("comp_sign", i, -1, "1.0")) ++
        Seq(("recon_ratio", -1, -1, "1.0"), ("resid_orth", -1, -1, "0.0"))
      val vals = expect
        .map { case (st, i, j, v) => s"('$st', $i, $j, $v)" }.mkString(", ")
      s"""WITH q AS (
         |  SELECT CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS dim,
         |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000) AS BIGINT) AS qv
         |  FROM embeddings),
         |tr AS (SELECT CAST(sum(t) AS BIGINT) AS tq FROM (
         |  SELECT count(*) * sum(qv * qv) - sum(qv) * sum(qv) AS t
         |  FROM q GROUP BY dim)),
         |inv(stat, i, j, v) AS (VALUES $vals)
         |SELECT stat, i, j, CAST(v AS DOUBLE) AS val, CAST(0 AS BIGINT) AS qval
         |FROM inv
         |UNION ALL
         |SELECT 'trace_q', -1, -1, 0.0, tq FROM tr""".stripMargin
    },
    "q_fs_linkage" -> fsLinkageSql,
    "q_kmeans" -> kmeansSql,
    "q_cluster_sample" -> clusterSampleSql,
    "q_semdedup" -> semdedupSql,
    "q_pq_encode" -> pqSql,
    "q_pq_drift" -> pqDriftSql,
    "q_pq_adc_topk" -> pqAdcSql(
      """SELECT query_id, neighbor_id, CAST(rn AS INT) AS rank,
        |  CAST(adc AS BIGINT) AS adc_dist
        |FROM r WHERE rn <= 5""".stripMargin),
    // Two-stage: 20 ADC candidates, exact-cosine rerank to 5.
    "q_pq_rerank" -> pqAdcSql(
      """, e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |       WHERE embedding IS NOT NULL),
        |cnd AS (SELECT query_id, neighbor_id FROM r WHERE rn <= 20),
        |rr AS (
        |  SELECT c.query_id, c.neighbor_id,
        |    list_cosine_similarity(a.v, b.v) AS cos,
        |    CAST(row_number() OVER (PARTITION BY c.query_id
        |      ORDER BY list_cosine_similarity(a.v, b.v) DESC,
        |        c.neighbor_id ASC) AS INT) AS rank
        |  FROM cnd c
        |  JOIN e a ON a.vec_id = c.query_id
        |  JOIN e b ON b.vec_id = c.neighbor_id)
        |SELECT query_id, neighbor_id, rank, round(cos, 4) + 0.0 AS cos
        |FROM rr WHERE rank <= 5""".stripMargin),
    // IVF routing (the q_ann_ivf_topk fragment, probe set aligned with
    // the ADC probes) restricts the ADC candidate CTE; rerank reuses the
    // fragment's own `e` table.
    "q_ivf_pq_topk" -> ivfPqTopkSqlOf(""),
    // Persistence must be invisible: identical oracle.
    "q_ann_ivfpq_persist" -> ivfPqTopkSqlOf(""),
    // Even-half build + frozen-codebook append of the odd half lands on
    // exactly the full-corpus lists under the same model/centroids.
    "q_ann_ivfpq_upsert" -> ivfPqTopkSqlOf(""),
    // Delete ≡ survivors-only build under the SAME codebooks: only the
    // stored lists gain the survivor filter (see ivfPqTopkSqlOf).
    "q_ann_ivfpq_delete" -> ivfPqTopkSqlOf(" AND vec_id % 7 <> 3"),
    // Compact must be invisible to probes: the delete oracle verbatim.
    "q_ann_ivfpq_compact" -> ivfPqTopkSqlOf(" AND vec_id % 7 <> 3"),
    // Stale-build + append + refit ≡ the from-scratch full-fit build
    // (value-keyed integer-exact Lloyd is read-back-invariant), so the
    // persist oracle verbatim.
    "q_ann_ivfpq_refit" -> ivfPqTopkSqlOf(""),
    "q_fps_sample" -> fpsSql)
}
