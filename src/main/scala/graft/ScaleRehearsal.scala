package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale rehearsal: measure the scaling EXPONENT, not the answers.
  *
  * The correctness gate runs at sf0.01 and the bench at sf0.1 (~17 MB) —
  * every "survives 100×" claim beyond that was design argument plus
  * plan-shape specs. This main converts the argument into data: it
  * inflates sf0.1 by a factor F (deterministic self-union with RE-KEYED
  * ids — each copy is a self-contained key universe, so join fan-outs and
  * group sizes are preserved) and times a query set at 1× and F×,
  * reporting the t(F×)/t(1×) ratio per query. Near-linear operators land
  * at ratio ≤ ~F (plus fixed overheads); anything super-linear — a
  * union-of-fronts funnel, an unguarded all-pairs verify — shows up as a
  * ratio well past F.
  *
  * Two inflation details keep the measurement honest:
  *   - `documents.text` is Caesar-rotated per copy (letters only, lengths
  *     and word boundaries preserved). A verbatim self-union would make
  *     every doc a 10-way exact/near dup, and dedup pair OUTPUT would grow
  *     quadratically for data-shape reasons, swamping the engine signal.
  *     Rotation keeps the per-copy dup structure identical to sf0.1, so
  *     true pairs scale linearly — the engine's scan/bucket machinery is
  *     what is under test.
  *   - `embeddings.embedding` is cyclically rotated by the copy index
  *     (norms preserved; random vectors decorrelate under rotation), so
  *     the near-dup cosine graph also scales linearly, not as F² cliques.
  *
  * Usage:
  *   runMain graft.ScaleRehearsal inflate <srcDir> <dstDir> <factor>
  *   runMain graft.ScaleRehearsal inflate-skew <srcDir> <dstDir> <factor>
  *   runMain graft.ScaleRehearsal run <baseDir> <bigDir> <factor> [q1,q2,…]
  *   runMain graft.ScaleRehearsal run-skew <baseDir> <bigDir> <factor>
  *
  * `run` prints one JSON line per query — {"query","t_base","t_big",
  * "ratio"} — and a final summary line. No oracle: the claim under test
  * is the exponent. Results land in BASELINE.md by hand.
  */
object ScaleRehearsal {

  /** The 12 most expensive bench queries (r10 graded run) + the four
    * flagship end-to-end generators + the ops the r10 verdict called out
    * as scale soft spots (skyline, exact quantiles, tiled AUC, LSH dedup).
    */
  val defaultSet: Seq[String] = Seq(
    "q_setsim_join", "q_ann_ivf_persist", "q_kmv_intersect",
    "q_ccnet_buckets", "q_textrank", "q_dedup_eval", "q_modularity",
    "q_text_curation", "q_bitmap_cooccur", "q_dedup_keepbest",
    "q_dedup_clusters", "q_quantile_bucket",
    "q_corpus_e2e", "q_osrs_leaderboard_e2e", "q_entity_resolution",
    "q_asof_auto",
    "q_skyline_docs", "q_group_quantile_bucket", "q_auc_continuous",
    "q_dedup_minhash_lsh",
    // r13 additions: the iterative kNN-graph pass and the bucketed-pair
    // density clustering — the new heavy iterators worth re-measuring.
    "q_nndescent", "q_dbscan_lsh",
    // r14 additions: the graph-walk family (full build + beam search
    // charged per query), the late-interaction scorer (exact + token-ANN
    // scale path + persisted index round trip), and the graph-path
    // filtered router (build + walk + filter per query).
    "q_ann_graph_topk", "q_hybrid_rrf_graph", "q_maxsim", "q_maxsim_ann",
    "q_maxsim_index", "q_ann_filtered_graph",
    // r15 additions: the delete life cycle (tombstone-masked walk;
    // delete -> compact with hole-repair descent; token-index survivor
    // mask) — each charges a build + delete + probe chain per query —
    // and the persisted IVF-PQ artifact round trip (fit + encode +
    // write + ADC probe + rerank).
    "q_ann_graph_delete", "q_ann_graph_compact", "q_maxsim_delete",
    "q_ann_ivfpq_persist",
    // r16 addition: the PQ delete (branch + mask + ADC probe) — the
    // shared builds these consumers resolve now get their own
    // `build:<tree>` rows (sharedBuildsOf), so every consumer row is
    // probe-vs-probe.
    "q_ann_ivfpq_delete",
    // r17 additions: the lifecycle newcomers the r16 verdict flagged as
    // exponent-less — graph generation rollback (branch + bad
    // maintenance commit + rollback + walk), the PQ compact (survivor
    // rewrite under CLONED codebooks), the IVF rollback (branch + bad
    // delete + retained compact + rollback + probe), and the
    // frozen-codebook PQ append (fit + even-half build + odd-half
    // encode/route/append + probe — its own chain, no shared tree).
    "q_ann_graph_rollback", "q_ann_ivfpq_compact", "q_ann_ivf_rollback",
    "q_ann_ivfpq_upsert",
    // r17 drift loop: the refit trigger (two map-only encodes + one
    // agg — should scale as a scan) and the drift-triggered refit
    // itself (stale build + frozen append + full re-fit/re-encode
    // rebuild — the honest price of codebook freshness, measured).
    "q_pq_drift", "q_ann_ivfpq_refit", "q_ivf_drift", "q_ann_ivf_refit")

  /** The skew-rehearsal set: the queries whose scale story depends on a
    * HOT KEY surviving — as-of auto-routing, per-group rank windows,
    * prefix-filtered set-sim, LSH banding, per-user sequence windows.
    */
  val skewSet: Seq[String] = Seq(
    "q_asof_auto", "q_group_quantile_bucket", "q_setsim_join",
    "q_dedup_minhash_lsh", "q_event_transitions")

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-scale-rehearsal")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // 100×-inflated inputs through a FIXED 32-way shuffle force every
      // reduce partition to sort-spill (q_setsim_join's posting shuffle
      // measured 2.5× super-linear in the second decade purely from
      // this); a real deployment scales reducer count with data, which
      // under AQE means a high INITIAL partition number that adaptive
      // coalescing shrinks back for small stages. 16× cores costs the
      // small 1× runs nothing (AQE folds them) and lets the 100× runs
      // spread their spill — the rehearsal then measures the operators,
      // not a fixed-knob sort wall. (Bench keeps partitions = cores: its
      // inputs are sf0.1-sized.)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        (cpus.toInt * 16).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.toSeq match {
      case Seq("inflate", src, dst, f) =>
        inflate(spark, src, dst, f.toInt, skew = false)
      case Seq("inflate-skew", src, dst, f) =>
        inflate(spark, src, dst, f.toInt, skew = true)
      case Seq("run", base, big, f) =>
        run(spark, base, big, f.toInt, defaultSet)
      case Seq("run-skew", base, big, f) =>
        run(spark, base, big, f.toInt, skewSet, routeCheck = true)
      case Seq("run", base, big, f, qs) =>
        run(spark, base, big, f.toInt, qs.split(",").map(_.trim).toSeq)
      case Seq("graph-skew", m, f) =>
        graphSkew(spark, m.toLong, f.toInt)
      case Seq("skyline-skew", n, f) =>
        skylineSkew(spark, n.toLong, f.toInt)
      case Seq("graph-maint", dir0, b) =>
        graphMaint(spark, dir0, b.toInt)
      case Seq("range-skew", m, f) =>
        rangeSkew(spark, m.toLong, f.toInt)
      case Seq("token-skew", m, f) =>
        tokenSkew(spark, m.toLong, f.toInt)
      case Seq("pq-refit-recall", n) =>
        pqRefitRecall(spark, n.toLong)
      case Seq("branch-cost", base, big) =>
        branchCost(spark, base, big)
      case other => sys.error(
        s"usage: inflate|inflate-skew src dst F | run|run-skew base big F [qs] | graph-skew|skyline-skew|range-skew|token-skew m F — got $other")
    }
    spark.stop()
  }

  // ---------------------------------------------------------------- inflate

  private val lower = "abcdefghijklmnopqrstuvwxyz"
  private val upper = lower.toUpperCase

  /** Letters-only Caesar rotation by `c` — lengths, digits, punctuation,
    * and word boundaries unchanged; shingles completely changed for c>0.
    *
    * A pure Caesar has only 26 distinct images: at f > 26 copies c and
    * c+26 would be VERBATIM identical and every doc a cross-copy exact
    * dup — the quadratic-clique artifact the rotation exists to avoid
    * (the embeddings column hit the same wall at f > dim and composes a
    * reversal; this is the text analogue). So the Caesar composes with a
    * per-word cyclic character shift by c/26: length-preserving, word
    * boundaries preserved (words shorter than the shift pass through),
    * giving 26·(shift range) distinct images — at f = 100, shifts 0..3
    * keep all 100 copies distinct.
    */
  private def caesar(col0: org.apache.spark.sql.Column, c: Int) = {
    val r = c % 26
    val k = c / 26
    val rotated =
      if (r == 0) col0
      else translate(col0, lower + upper,
        lower.drop(r) + lower.take(r) + upper.drop(r) + upper.take(r))
    if (k == 0) rotated
    else array_join(
      transform(split(rotated, " "), w =>
        when(length(w) > k,
          concat(w.substr(lit(k + 1), length(w)), w.substr(lit(1), lit(k))))
          .otherwise(w)),
      " ")
  }

  /** F copies of `df` with per-copy column rewrites. `rewrite(c)` returns
    * the select list for copy c. One scan per copy; copy 0 is verbatim.
    */
  private def copies(df: DataFrame, f: Int)(
      rewrite: Int => Seq[org.apache.spark.sql.Column]): DataFrame =
    (0 until f).map(c => df.select(rewrite(c): _*)).reduce(_ unionAll _)

  /** `skew = false`: each copy is a disjoint key universe (join fan-outs
    * preserved — isolates engine cost from artificial pair explosions).
    *
    * `skew = true`: inflation CONCENTRATES keys, the way real corpora
    * scale — skew grows superlinearly with size (one hot item, one
    * boilerplate line, one giant host). Copies ≥ 1 route half their rows
    * onto one pre-existing hot key:
    *   - events: half of each copy's events land on ONE user (≈ 45% of
    *     the 10× table) — a giant as-of key (joinAuto must route salted)
    *     and a giant per-user sequence window;
    *   - documents: half of each copy's docs get ONE verbatim boilerplate
    *     line prepended (the rest of the text still Caesar-rotates) —
    *     hot shingles/bands for set-sim and MinHash-LSH;
    *   - lineitem: half of each copy's rows point at ONE part — a hot
    *     dimension join key.
    * Everything else inflates exactly as the disjoint mode does.
    */
  def inflate(spark: SparkSession, src: String, dst: String, f: Int,
      skew: Boolean): Unit = {
    new java.io.File(dst).mkdirs()
    def maxOf(table: String, key: String): Long =
      Tables.load(spark, src, table).agg(max(col(key))).head.getLong(0) + 1

    // Key strides — each copy offsets every surrogate key by c*stride so
    // copies are disjoint, self-contained universes (joins inside a copy
    // behave exactly like sf0.1; nothing joins across copies).
    val sO = maxOf("orders", "o_orderkey")
    val sC = maxOf("customer", "c_custkey")
    val sP = maxOf("part", "p_partkey")
    val sS = maxOf("supplier", "s_suppkey")
    val sE = maxOf("events", "event_id")
    val sU = Tables.events(spark, src).agg(max("user_id")).head.getLong(0) + 1
    val sD = maxOf("documents", "doc_id")
    val sV = maxOf("embeddings", "vec_id")

    def write(name: String, df: DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")

    // Tiny fixed dims: referenced by nationkey/regionkey from every copy —
    // copied verbatim (at 100 TB these stay broadcast dims; scaling them
    // would change join semantics, not stress anything).
    write("region", Tables.region(spark, src))
    write("nation", Tables.nation(spark, src))

    write("customer", copies(Tables.customer(spark, src), f)(c => Seq(
      (col("c_custkey") + lit(c * sC)).as("c_custkey"),
      col("c_name"), col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))))
    write("supplier", copies(Tables.supplier(spark, src), f)(c => Seq(
      (col("s_suppkey") + lit(c * sS)).as("s_suppkey"),
      col("s_name"), col("s_nationkey"), col("s_acctbal"))))
    write("part", copies(Tables.part(spark, src), f)(c => Seq(
      (col("p_partkey") + lit(c * sP)).as("p_partkey"),
      col("p_name"), col("p_brand"), col("p_type"), col("p_size"),
      col("p_retailprice"))))
    write("orders", copies(Tables.orders(spark, src), f)(c => Seq(
      (col("o_orderkey") + lit(c * sO)).as("o_orderkey"),
      (col("o_custkey") + lit(c * sC)).as("o_custkey"),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
      col("o_orderpriority"))))
    // Hot keys for skew mode: pre-existing minimum ids, so the hot key
    // also carries copy-0's original rows.
    lazy val hotUser = Tables.events(spark, src)
      .agg(min("user_id")).head.getLong(0)
    lazy val hotPart = Tables.part(spark, src)
      .agg(min("p_partkey")).head.getLong(0)
    val boiler = "Subscribe to our newsletter for updates and offers. "

    write("lineitem", copies(Tables.lineitem(spark, src), f)(c => Seq(
      (col("l_orderkey") + lit(c * sO)).as("l_orderkey"),
      (if (skew && c > 0)
        when(pmod(col("l_orderkey"), lit(2)) === 0, lit(hotPart))
          .otherwise(col("l_partkey") + lit(c * sP))
      else col("l_partkey") + lit(c * sP)).as("l_partkey"),
      (col("l_suppkey") + lit(c * sS)).as("l_suppkey"),
      col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
      col("l_discount"), col("l_tax"), col("l_returnflag"),
      col("l_linestatus"), col("l_shipdate"))))
    write("events", copies(Tables.events(spark, src), f)(c => Seq(
      (col("event_id") + lit(c * sE)).as("event_id"), col("ts"),
      (if (skew && c > 0)
        when(pmod(col("event_id"), lit(2)) === 0, lit(hotUser))
          .otherwise(col("user_id") + lit(c * sU))
      else col("user_id") + lit(c * sU)).as("user_id"),
      col("event_type"), col("value"), col("props"))))
    write("documents", copies(Tables.documents(spark, src), f)(c => Seq(
      (col("doc_id") + lit(c * sD)).as("doc_id"),
      (if (skew && c > 0)
        when(pmod(col("doc_id"), lit(2)) === 0,
          concat(lit(boiler), caesar(col("text"), c)))
          .otherwise(caesar(col("text"), c))
      else caesar(col("text"), c)).as("text"),
      col("lang"), col("source"),
      // Keep the fixture invariant n_chars == length(text): the
      // boilerplate prepend lengthens exactly the rows it touches
      // (the Caesar rotation is length-preserving, so plain copies
      // pass n_chars through).
      (if (skew && c > 0)
        when(pmod(col("doc_id"), lit(2)) === 0,
          col("n_chars") + lit(boiler.length))
          .otherwise(col("n_chars"))
      else col("n_chars")).as("n_chars"))))
    // Cyclic rotation by c mod dim (slice is 1-based; dim read from the
    // row so factors past the dimensionality keep rotating), composed
    // with a REVERSAL on every second wrap — pure rotation has only dim
    // distinct images, so at f > dim copies would collide verbatim and
    // reintroduce the exact-dup cliques the rotation exists to avoid.
    // Both transforms preserve norms; random vectors decorrelate under
    // either.
    write("embeddings", copies(Tables.embeddings(spark, src), f)(c => Seq(
      (col("vec_id") + lit(c * sV)).as("vec_id"),
      (if (c == 0) col("embedding")
       else {
         val d = size(col("embedding"))
         val r = pmod(lit(c), d)
         val rot = concat(
           slice(col("embedding"), r + lit(1), lit(1000000)),
           slice(col("embedding"), lit(1), r))
         when((lit(c) / d).cast("int") % 2 === 1, reverse(rot))
           .otherwise(rot)
       }).as("embedding"),
      col("label"))))
    println(s"""{"inflated":"$dst","factor":$f}""")
  }

  // -------------------------------------------------------------------- run

  private def time(body: => Unit): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }

  // ------------------------------------------------------------- token-skew

  /** Hot-TOKEN rehearsal for the late-interaction family: the gated
    * MaxSim queries slice i.i.d. fixture embeddings, so no md5 bucket
    * ever dominates — this mode plants the failure shape directly. Two
    * shapes at `m` and `f·m` documents (4 tokens × 16 dims each):
    *   - uniform:   every token pseudo-random from (doc, pos, dim)
    *     arithmetic;
    *   - hot-token: token 0 of every EVEN document is THE SAME
    *     boilerplate vector — identical projection signs, so ONE bucket
    *     in EVERY table holds half the corpus token table (the "the"
    *     token of web text).
    * Measured: the inline token-ANN scorer (topKViaAnnMd5 — bucket join
    * + per-query-token tokenK cut + exact rerank), the persisted-index
    * build (range layout under one fat (t, b) run) and the persisted
    * probe. Reported per op like graph-skew: skew overhead at fixed
    * size (t_shape/t_uniform) and scaling ratio t(f·m)/t(m) per shape —
    * bounded overhead AND sub-linear-ish scaling together are the "one
    * boilerplate token does not kill a round" claim. The hot-bucket
    * pre-cut in lshTopKImpl / MaxSimIndex.topK (partition-local tokenK
    * cut before the per-query-token window) and the id in the index's
    * range keys are the mitigations under test.
    */
  def tokenSkew(spark: SparkSession, m: Long, f: Int): Unit = {
    import org.apache.spark.sql.DataFrame
    def toks(size: Long, shape: String): DataFrame = {
      val pose = spark.range(size).select(col("id").as("doc_id"),
        explode(sequence(lit(0), lit(3))).as("pos"))
      // Per-component mix must MULTIPLY the dim into the key: a pure
      // additive shift (doc·31 + pos·13 + d·7 mod p) makes every vector
      // a rotation of the same residue — the whole corpus collapses to
      // p distinct token vectors and even the "uniform" shape is one
      // giant bucket family (measured: the first cut of this rehearsal
      // did exactly that).
      val noise = transform(sequence(lit(0), lit(15)), d =>
        (pmod((col("doc_id") * 31 + col("pos") * 13 + lit(1)) * (d + lit(1))
          + d * 7, lit(1009)) - lit(504)).cast("double") / 504.0)
      val boiler = transform(sequence(lit(0), lit(15)), d =>
        (pmod(d * 97 + lit(11), lit(1009)) - lit(504)).cast("double") / 504.0)
      val tv = shape match {
        case "uniform" => noise
        case "hot-token" =>
          when(pmod(col("doc_id"), lit(2)) === 0 && col("pos") === 0,
            boiler).otherwise(noise)
        case other => sys.error(
          s"token-skew shape must be uniform|hot-token, got '$other'")
      }
      pose.select(col("doc_id"), col("pos"), tv.as("tv"))
    }
    // appId in every graft_tsk_ path, like the other swept families:
    // the stale-tmp sweep's live-app guard is contains(liveAppId), so an
    // appId-free fixture is deletable by a CONCURRENT app's sweep once
    // past the mtime cutoff — and two simultaneous rehearsals would
    // collide on identical paths.
    val tskApp = spark.sparkContext.applicationId
    def mat(size: Long, shape: String): DataFrame = {
      val p = s"${System.getProperty("java.io.tmpdir")}/graft_tsk_${size}_${shape}_$tskApp"
      toks(size, shape).write.mode("overwrite").parquet(p)
      spark.read.parquet(p)
    }
    def annOnce(df: DataFrame): Unit =
      graft.ops.MaxSim.topKViaAnnMd5(df.filter(col("doc_id") < 50), df,
        "doc_id", "pos", "tv", k = 10, dims = 16, tokenK = 8,
        numPlanes = 8, tables = 2).count(): Unit
    def idxOnce(df: DataFrame, tag: String): (Double, Double) = {
      val p = s"${System.getProperty("java.io.tmpdir")}/graft_tsk_idx_${tag}_$tskApp"
      try {
        val tw = time(graft.ops.MaxSimIndex.write(spark, p, df,
          "doc_id", "pos", "tv", dims = 16, numPlanes = 8, tables = 2))
        val tp = time(graft.ops.MaxSimIndex.topK(spark, p,
          df.filter(col("doc_id") < 50), "doc_id", "pos", "tv",
          k = 10, tokenK = 8).count(): Unit)
        (tw, tp)
      } finally graft.ops.LocalFs.deleteRecursively(new java.io.File(p))
    }
    val shapes = Seq("uniform", "hot-token")
    val frames = (for (s <- shapes; sz <- Seq(m, m * f))
      yield (s, sz) -> mat(sz, s)).toMap
    annOnce(frames(("uniform", m))) // warm-up: plan/codegen
    val uni = scala.collection.mutable.Map.empty[String, Double]
    for (shape <- shapes) {
      val tAnn1 = time(annOnce(frames((shape, m))))
      val tAnnF = time(annOnce(frames((shape, m * f))))
      val (tw1, tp1) = idxOnce(frames((shape, m)), s"${shape}_m")
      val (twF, tpF) = idxOnce(frames((shape, m * f)), s"${shape}_fm")
      for ((op, t1, tF) <- Seq(("maxsim_ann", tAnn1, tAnnF),
          ("msidx_write", tw1, twF), ("msidx_probe", tp1, tpF))) {
        if (shape == "uniform") uni(op) = t1
        println(f"""{"op":"$op","shape":"$shape","t_m":$t1%.2f,"t_fm":$tF%.2f,"scale_ratio":${tF / t1}%.2f,"skew_overhead":${t1 / uni(op)}%.2f}""")
      }
    }
    println(s"""{"metric":"token_skew","m":$m,"factor":$f}""")
    for (s <- shapes; sz <- Seq(m, m * f))
      graft.ops.LocalFs.deleteRecursively(new java.io.File(
        s"${System.getProperty("java.io.tmpdir")}/graft_tsk_${sz}_${s}_$tskApp"))
  }

  // -------------------------------------------------------- pq-refit-recall

  /** Measures WHAT THE DRIFT→REFIT LOOP BUYS: recall@10 of the
    * persisted IVF-PQ index on a planted-drift corpus, before and
    * after [[graft.ops.PqIndex.refit]], at identical probe parameters.
    *
    * Setup isolates the PQ layer: the base cohort clusters in the
    * FIRST half of the dims, the drifted cohort (half the base size)
    * in the SECOND half — so the stale codebooks, fit on base only,
    * have no centroids anywhere near the drifted subspaces and ADC
    * cannot discriminate within the drifted region (every drifted
    * vector quantizes to the same far-away codes; the candidateK cut
    * goes near-arbitrary there). The COARSE codebook samples BOTH
    * cohorts so routing stays adequate throughout — the measured
    * recall gap is the re-encoding layer's, the one refit repairs
    * (routing decay is [[graft.ops.IvfIndex.routingDrift]]'s axis, a
    * rebuild's problem).
    *
    * Prints: the drift ratio the monitor would alarm on, recall@10 of
    * the drifted probes against brute-force truth before/after refit,
    * and both probe latencies (refit must not change probe cost — same
    * artifact shape, same parameters).
    */
  def pqRefitRecall(spark: SparkSession, n: Long): Unit = {
    val dims = 64
    val app = spark.sparkContext.applicationId
    val tmp = System.getProperty("java.io.tmpdir")
    def cohort(size: Long, offset: Long, half: Int): DataFrame = {
      val axis = pmod(col("vec_id"), lit(8)) * 4 + lit(half * 32)
      val v = transform(sequence(lit(0), lit(dims - 1)), d =>
        when(d.cast("long") === axis, lit(8.0)).otherwise(lit(0.0)) +
          (pmod((col("vec_id") * 31 + lit(1)) * (d + lit(1)) + d * 7,
            lit(1009)) - lit(504)).cast("double") / 504.0)
      spark.range(size).select((col("id") + offset).as("vec_id"))
        .select(col("vec_id"), v.as("embedding"))
    }
    def mat(df: DataFrame, tag: String): DataFrame = {
      val p = s"$tmp/graft_prr_${tag}_$app"
      df.write.mode("overwrite").parquet(p)
      spark.read.parquet(p)
    }
    try { pqRefitRecallBody(spark, n, cohort, mat) }
    finally Seq("base", "drift", "probes", "idx").foreach(t =>
      graft.ops.LocalFs.deleteRecursively(new java.io.File(
        s"$tmp/graft_prr_${t}_$app")))
  }

  private def pqRefitRecallBody(spark: SparkSession, n: Long,
      cohort: (Long, Long, Int) => DataFrame,
      mat: (DataFrame, String) => DataFrame): Unit = {
    val base = mat(cohort(n, 0L, 0), "base")
    val drift = mat(cohort(n / 2, 10000000L, 1), "drift")
    val all = base.unionByName(drift)
    val tmp = System.getProperty("java.io.tmpdir")
    val app = spark.sparkContext.applicationId
    val model = graft.ml.Pq.fit(base, "vec_id", "embedding",
      dims = 64, m = 4, k = 8, iterations = 2)
    // Coarse codebook over BOTH cohorts (see scaladoc): every ~200th id.
    val cent = all.filter(pmod(col("vec_id"), lit(200)) === 0)
      .select(col("vec_id").as("centroid_id"),
        col("embedding").as("centroid"))
    val path = s"$tmp/graft_prr_idx_$app"
    graft.ops.PqIndex.write(spark, path, base, "vec_id", "embedding",
      cent, model)
    graft.ops.PqIndex.append(spark, path, drift, "vec_id", "embedding")
    val probes = mat(drift.filter(pmod(col("vec_id"), lit(largeStep(n)))
      === 1), "probes")
    val truth = graft.ops.Similarity.bruteForceTopKAgg(probes, all,
      "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id"))
      .localCheckpoint(true)
    val nTruth = truth.count()
    require(nTruth > 0, s"pq-refit-recall $n: the probe-sampling rule " +
      "selected no probes (n too small for largeStep) — nothing to score")
    def recallAndTime(): (Double, Double) = {
      var hits = 0L
      val t = time {
        val got = graft.ops.PqIndex.topK(spark, path, probes,
          "vec_id", "embedding", k = 10, candidateK = 20, nprobe = 4)
        hits = truth.join(got.select(col("query_id"),
            col("neighbor_id")),
          Seq("query_id", "neighbor_id"), "left_semi").count()
      }
      (hits.toDouble / nTruth, t)
    }
    val dr = graft.ml.Pq.quantizationDrift(base, drift,
      "vec_id", "embedding", model).collect()(0)
    val ratio = dr.getDouble(dr.fieldIndex("drift_ratio"))
    recallAndTime(): Unit // plan/codegen/footer-read warm-up
    val (recallStale, tStale) = recallAndTime()
    val tRefit = time(
      graft.ops.PqIndex.refit(spark, path, iterations = 2): Unit)
    val (recallRefit, tProbe) = recallAndTime()
    println(f"""{"metric":"pq_refit_recall","n":$n,"drift_ratio":$ratio%.2f,"recall_stale":$recallStale%.4f,"recall_refit":$recallRefit%.4f,"t_probe_stale":$tStale%.2f,"t_probe_refit":$tProbe%.2f,"t_refit":$tRefit%.2f,"probes":$nTruth}""")
    graft.ops.Checkpoints.release(truth)
  }

  /** Probe-sampling step: ~50 probes regardless of n. */
  private def largeStep(n: Long): Long = math.max(1L, n / 2 / 50)

  // ------------------------------------------------------------ branch-cost

  /** Measures the claim [[graft.ops.VersionedTree.branch]] makes across
    * ALL FOUR persisted index families: a branch is METADATA work (hard
    * links), so its cost tracks the FILE COUNT of the cloned tree, not
    * the data size — branching a 10×-bigger index must cost ≈ the same
    * wall time. The families have genuinely different file-count shapes
    * (graph: a handful of part files per generation; IVF and PQ:
    * one-file-per-Voronoi-cell partitioned lists — hundreds of inodes;
    * maxsim: per-table token partitions), which is exactly why one
    * measured row per family is needed rather than extrapolating from
    * the graph. Shared trees build through the real SharedGraphs path;
    * the token index (no shared family) builds the q_maxsim_index
    * fixture inline. Reports (t, files, bytes) per (family, dir) so
    * flatness is checkable against the size growth.
    */
  def branchCost(spark: SparkSession, base: String, big: String): Unit = {
    val appId = spark.sparkContext.applicationId
    val tmp = System.getProperty("java.io.tmpdir")
    def stats(f: java.io.File): (Long, Long) =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty)
          .map(stats).foldLeft((0L, 0L)) { case ((a, b), (c, d)) =>
            (a + c, b + d) }
      else (1L, f.length())
    // Key the fixture on the FULL path, not the basename: base and big
    // dirs with identical leaf names (/data/a/sf vs /data/b/sf) would
    // otherwise collide, and the "big" row would silently re-measure
    // the base-sized fixture — flatness vacuously confirmed.
    def pathKey(dir: String): String =
      new java.io.File(dir).getAbsolutePath.replaceAll("[^A-Za-z0-9]", "_")
    def maxsimSrc(dir: String): String = {
      val p = s"$tmp/graft_gidx_brcms_${pathKey(dir)}_$appId"
      if (!new java.io.File(p).exists()) {
        val toks = Tables.embeddings(spark, dir)
          .filter(col("embedding").isNotNull)
          .select(col("vec_id"), posexplode(array((0 until 4).map(t =>
            slice(col("embedding").cast("array<double>"),
              t * 16 + 1, 16)): _*)).as(Seq("pos", "tv")))
        graft.ops.MaxSimIndex.write(spark, p, toks, "vec_id", "pos", "tv",
          dims = 16, numPlanes = 4, tables = 2)
      }
      p
    }
    val sims = graft.queries.SimilarityQueries.sharedBuilders
    val mls = graft.queries.MlQueries.sharedBuilders
    val families: Seq[(String, String => String,
        (String, String) => Unit)] = Seq(
      ("graph", dir => sims("boosted")(spark, dir),
        (s, d) => graft.ops.GraphIndex.branch(spark, s, d)),
      ("ivf", dir => sims("ivf_m50")(spark, dir),
        (s, d) => graft.ops.IvfIndex.branch(spark, s, d)),
      ("pq", dir => mls("pq_m25")(spark, dir),
        (s, d) => graft.ops.PqIndex.branch(spark, s, d)),
      ("maxsim", maxsimSrc _,
        (s, d) => graft.ops.MaxSimIndex.branch(spark, s, d)))
    for ((fam, srcOf, doBranch) <- families;
        (dir, tag) <- Seq((base, "base"), (big, "big"))) {
      val src = srcOf(dir)
      // Stats over the WHOLE source tree: every family's branch clones
      // its full live state (generation dirs, centroids, pending masks),
      // so the source's inode count is the work the claim bounds.
      val (files, bytes) = stats(new java.io.File(src))
      val dst = s"$tmp/graft_gidx_brc_${fam}_${tag}_$appId"
      val t = time(doBranch(src, dst))
      println(f"""{"op":"branch","family":"$fam","dir":"$tag","t":$t%.3f,"files":$files,"bytes":$bytes}""")
      graft.ops.LocalFs.deleteRecursively(new java.io.File(dst))
    }
    for (dir <- Seq(base, big))
      graft.ops.LocalFs.deleteRecursively(new java.io.File(
        s"$tmp/graft_gidx_brcms_${pathKey(dir)}_$appId"))
  }

  // ------------------------------------------------------------- graph-skew

  /** Power-law rehearsal for the graph family: the gated graph queries
    * derive edges from doc_id arithmetic (quasi-uniform by construction),
    * so a hot node cannot be reached through table inflation — this mode
    * measures the OPERATORS directly on generated edge tables instead.
    * Three shapes at `m` and `f·m` edges over m/10 nodes:
    *   - uniform:  src and dst both hash-spread;
    *   - hot-dst:  ONE node receives 45% of all in-edges (the web-graph
    *     super-sink PageRank's dst-keyed contribution sum meets);
    *   - hot-src:  ONE node emits 45% of all out-edges (the super-hub
    *     whose rank/label/counter joins fan out of one key).
    * Reported per operator: skew overhead at fixed size
    * (t_shape/t_uniform) and the scaling ratio t(f·m)/t(m) per shape —
    * sub-linear scaling AND bounded skew overhead together are the "no
    * single hot node kills a round" claim, measured.
    */
  def graphSkew(spark: SparkSession, m: Long, f: Int): Unit = {
    import org.apache.spark.sql.DataFrame
    def edges(size: Long, shape: String): DataFrame = {
      val nodes = math.max(2L, size / 10)
      val base = spark.range(size)
      val src = pmod(col("id") * 2654435761L + 11, lit(nodes))
      val dst = pmod(col("id") * 40503L + 7, lit(nodes))
      val hot = pmod(col("id"), lit(20)) < 9 // 45%
      val df = shape match {
        case "uniform" => base.select(src.as("src"), dst.as("dst"))
        case "hot-dst" => base.select(src.as("src"),
          when(hot, lit(0L)).otherwise(dst).as("dst"))
        case "hot-src" => base.select(
          when(hot, lit(0L)).otherwise(src).as("src"), dst.as("dst"))
        case other => sys.error(
          s"graph-skew shape must be uniform|hot-dst|hot-src, got '$other'")
      }
      df.filter(col("src") =!= col("dst"))
    }
    // Materialize each edge table before timing (parquet round-trip, so
    // the timed operator reads a real scan, not an in-plan range).
    def mat(size: Long, shape: String): DataFrame = {
      val p = s"${System.getProperty("java.io.tmpdir")}/graft_gskew_${size}_$shape"
      edges(size, shape).write.mode("overwrite").parquet(p)
      spark.read.parquet(p)
    }
    val ops: Seq[(String, DataFrame => Long)] = Seq(
      ("pagerank", e => graft.graph.PageRank.ranks(e, "src", "dst", 3).count()),
      ("label_prop", e => graft.graph.LabelPropagation
        .communities(e, "src", "dst", rounds = 3).count()),
      ("hyperanf", e => graft.graph.HyperAnf
        .neighborhoodFunction(e, "src", "dst", rounds = 3).count()),
      ("triangles", e => graft.graph.Triangles.perNode(e, "src", "dst").count()))
    val shapes = Seq("uniform", "hot-dst", "hot-src")
    val frames = (for (s <- shapes; sz <- Seq(m, m * f))
      yield (s, sz) -> mat(sz, s)).toMap
    // Warm-up on the smallest uniform frame.
    ops.foreach { case (_, fn) => fn(frames(("uniform", m))) }
    val uniBase = scala.collection.mutable.Map.empty[String, Double]
    for ((opName, fn) <- ops; shape <- shapes) {
      val t1 = time(fn(frames((shape, m))))
      val tF = time(fn(frames((shape, m * f))))
      if (shape == "uniform") uniBase(opName) = t1
      val overhead = t1 / uniBase(opName)
      println(f"""{"op":"$opName","shape":"$shape","t_m":$t1%.2f,"t_fm":$tF%.2f,"scale_ratio":${tF / t1}%.2f,"skew_overhead":$overhead%.2f}""")
    }
    println(s"""{"metric":"graph_skew","m":$m,"factor":$f}""")
    // The generated edge tables are rehearsal scaffolding, not results:
    // delete them on the way out (the 20M-edge trees are ~GBs each; the
    // startup IVF sweep only matches its own prefix, so leftovers from a
    // killed run would otherwise sit in tmp forever).
    for (s <- shapes; sz <- Seq(m, m * f)) {
      graft.ops.LocalFs.deleteRecursively(new java.io.File(
        s"${System.getProperty("java.io.tmpdir")}/graft_gskew_${sz}_$s"))
    }
  }

  /** Skyline worst-case rehearsal: the d>2 SFS guard rounds and the 2-d
    * tiled sweep measured on GENERATED shapes table inflation cannot
    * reach (the gated skyline queries read documents columns whose front
    * is tiny by construction):
    *   - `staircase` (2-d): d2 = V−1−d1 with a large value domain, so
    *     EVERY distinct d1 survives — the tiled sweep's survivor table
    *     is as big as its input;
    *   - `mixed` (3-d): pseudo-random dims — typical small front, guard
    *     rounds shrink fast;
    *   - `anti` (3-d): every point on the d1+d2+d3 = const simplex, so
    *     NOTHING dominates anything — front = n, the intrinsic-front
    *     case the guard's stop-when-not-shrinking rule exists for. The
    *     reported round counts are the evidence the guard fired (head =
    *     phase-1 union, then one entry per round).
    */
  def skylineSkew(spark: SparkSession, n: Long, f: Int): Unit = {
    val V = 10000000L
    def pts(size: Long, shape: String): DataFrame = {
      val base = spark.range(size)
      val a = pmod(col("id") * 2654435761L + 11, lit(V))
      val b = pmod(col("id") * 40503L + 7, lit(V))
      val c0 = pmod(col("id") * 7919L + 3, lit(V))
      shape match {
        case "staircase" => base.select(a.as("d1"), (lit(V - 1) - a).as("d2"))
        case "mixed" => base.select(a.as("d1"), b.as("d2"), c0.as("d3"))
        case "anti" => base.select(a.as("d1"), b.as("d2"),
          (lit(2 * V) - a - b).as("d3"))
        case other => sys.error(
          s"skyline shape must be staircase|mixed|anti, got '$other'")
      }
    }
    def mat(size: Long, shape: String): DataFrame = {
      val p = s"${System.getProperty("java.io.tmpdir")}/graft_sky_${size}_$shape"
      pts(size, shape).write.mode("overwrite").parquet(p)
      spark.read.parquet(p)
    }
    // Warm-up (classload/JIT; the honest-ratio rationale from run()).
    graft.ops.Skyline.front2d(pts(10000, "staircase"), "d1", "d2").count()
    for (shape <- Seq("staircase", "mixed", "anti")) {
      val dims = if (shape == "staircase") Seq("d1", "d2")
        else Seq("d1", "d2", "d3")
      def once(size: Long): (Double, Long, Seq[Long]) = {
        val df = mat(size, shape)
        var out = 0L
        var rounds: Seq[Long] = Nil
        val t = time {
          val (res, cnts) = graft.ops.Skyline.frontWithRounds(df, dims,
            1L << 21)
          out = res.count()
          rounds = cnts
        }
        (t, out, rounds)
      }
      val (t1, front1, r1) = once(n)
      val (tF, frontF, rF) = once(n * f)
      println(f"""{"op":"skyline${dims.size}d","shape":"$shape","t_n":$t1%.2f,"t_fn":$tF%.2f,"scale_ratio":${tF / t1}%.2f,"front_n":$front1,"front_fn":$frontF,"rounds_n":${r1.mkString("[", ",", "]")},"rounds_fn":${rF.mkString("[", ",", "]")}}""")
    }
    for (shape <- Seq("staircase", "mixed", "anti"); sz <- Seq(n, n * f)) {
      graft.ops.LocalFs.deleteRecursively(new java.io.File(
        s"${System.getProperty("java.io.tmpdir")}/graft_sky_${sz}_$shape"))
    }
  }

  /** Incremental kNN-graph maintenance vs full rebuild
    * ([[graft.ops.GraphIndex]]): build the index on the corpus minus the
    * newest `batchSize` ids, stitch those in as ONE maintenance batch,
    * and rebuild from scratch for comparison. The claim under test is
    * that the maintenance batch's cost tracks the BATCH's neighborhood
    * footprint (seed walk + localized descent), not the corpus — the
    * rebuild/maintenance ratio should grow with corpus size at fixed
    * batch size.
    */
  def graphMaint(spark: SparkSession, dir: String, batchSize: Int): Unit = {
    val emb = Tables.embeddings(spark, dir)
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("vb"))
      .localCheckpoint(eager = true)
    val maxId = emb.agg(max("vec_id")).head.getLong(0)
    val cut = maxId - batchSize
    val base = emb.filter(col("vec_id") <= cut)
    val batch = emb.filter(col("vec_id") > cut)
    val n = emb.count()
    val tmp = System.getProperty("java.io.tmpdir")
    val app = spark.sparkContext.applicationId
    val p1 = s"$tmp/graft_gidx_maintA_$app"
    val p2 = s"$tmp/graft_gidx_maintB_$app"
    def rm(path: String): Unit =
      graft.ops.LocalFs.deleteRecursively(path)
    val tBuild = time { graft.ops.GraphIndex.write(spark, p1, base,
      "vec_id", "vb", k = 5, rounds = 2, maxDegree = 12) }
    val tMaint = time { graft.ops.GraphIndex.applyMaintenanceBatch(spark,
      p1, batch, "vec_id", "vb", k = 5, rounds = 2, maxDegree = 12) }
    val tRebuild = time { graft.ops.GraphIndex.write(spark, p2, emb,
      "vec_id", "vb", k = 5, rounds = 2, maxDegree = 12) }
    graft.ops.Checkpoints.release(emb)
    rm(p1); rm(p2)
    println(f"""{"metric":"graph_maint","n":$n,"batch":$batchSize,"t_build_base":$tBuild%.2f,"t_maint_batch":$tMaint%.2f,"t_rebuild_full":$tRebuild%.2f,"rebuild_over_maint":${tRebuild / tMaint}%.2f}""")
  }

  /** Range-join bin-skew rehearsal: [[graft.ops.RangeJoin]] measured on
    * generated points/intervals where one BIN holds 45% of one side —
    * the hot-key shape the binned equi-join shuffles on. The axis scales
    * WITH n (more events over more time, the real-data shape), so
    * per-bin density is constant and sub-linear-to-linear scaling is the
    * pass bar; the skew shapes measure whether one hot bin key stalls
    * the join (AQE skew splitting is the designed mitigation).
    */
  def rangeSkew(spark: SparkSession, m: Long, f: Int): Unit = {
    val bin = 1000L
    def tables(size: Long, shape: String): (DataFrame, DataFrame) = {
      val axis = size * 10
      val hotT = lit(7L) // inside bin 0
      val pBase = spark.range(size)
      val iBase = spark.range(math.max(1L, size / 100))
      val pT = pmod(col("id") * 2654435761L + 11, lit(axis))
      val iS = pmod(col("id") * 40503L + 7, lit(axis))
      val hot = pmod(col("id"), lit(20)) < 9 // 45%
      val points = shape match {
        case "uniform" | "hot-ivl" => pBase.select(pT.as("t"))
        case "hot-pts" => pBase.select(
          when(hot, hotT).otherwise(pT).as("t"))
        case other => sys.error(
          s"range shape must be uniform|hot-pts|hot-ivl, got '$other'")
      }
      val ivs = (shape match {
        case "hot-ivl" => iBase.select(
          when(hot, lit(0L)).otherwise(iS).as("iv_start"))
        case _ => iBase.select(iS.as("iv_start"))
      }).select(col("iv_start"), (col("iv_start") + lit(bin - 1)).as("iv_end"))
      (points, ivs)
    }
    def mat(df: DataFrame, name: String): DataFrame = {
      val p = s"${System.getProperty("java.io.tmpdir")}/graft_rsk_$name"
      df.write.mode("overwrite").parquet(p)
      spark.read.parquet(p)
    }
    val shapes = Seq("uniform", "hot-pts", "hot-ivl")
    val frames = (for (s <- shapes; sz <- Seq(m, m * f)) yield {
      val (p, i) = tables(sz, s)
      (s, sz) -> (mat(p, s"p_${sz}_$s"), mat(i, s"i_${sz}_$s"))
    }).toMap
    def join(p: DataFrame, i: DataFrame): Long =
      graft.ops.RangeJoin.pointInInterval(p, i, "t", "iv_start", "iv_end",
        binWidth = bin).count()
    join(frames(("uniform", m))._1, frames(("uniform", m))._2) // warm-up
    var uniBase = 0.0
    for (shape <- shapes) {
      val (p1, i1) = frames((shape, m))
      val (pF, iF) = frames((shape, m * f))
      var rows1 = 0L; var rowsF = 0L
      val t1 = time { rows1 = join(p1, i1) }
      val tF = time { rowsF = join(pF, iF) }
      if (shape == "uniform") uniBase = t1
      println(f"""{"op":"range_join","shape":"$shape","t_m":$t1%.2f,"t_fm":$tF%.2f,"scale_ratio":${tF / t1}%.2f,"skew_overhead":${t1 / uniBase}%.2f,"rows_m":$rows1,"rows_fm":$rowsF}""")
    }
    for (s <- shapes; sz <- Seq(m, m * f); side <- Seq("p", "i")) {
      graft.ops.LocalFs.deleteRecursively(new java.io.File(
        s"${System.getProperty("java.io.tmpdir")}/graft_rsk_${side}_${sz}_$s"))
    }
  }

  /** Which SHARED persisted trees each consumer query resolves (the
    * SharedGraphs families) — the rehearsal pre-charges these as
    * explicit `build:<name>` rows so no consumer's continuity ratio
    * carries a one-off build it happens to touch first (the r15 table
    * needed a READING NOTE to explain "q_nndescent 106.64"; this keeps
    * every row probe-vs-probe and gives each build its own honest
    * exponent).
    */
  private val sharedBuildsOf: Map[String, Seq[String]] = Map(
    "q_nndescent" -> Seq("boosted"),
    "q_ann_graph_topk" -> Seq("boosted"),
    "q_ann_filtered_graph" -> Seq("boosted"),
    "q_ann_graph_persist" -> Seq("boosted"),
    "q_semdedup_nnd" -> Seq("boosted_even"),
    "q_ann_graph_delete" -> Seq("boosted_even"),
    "q_ann_graph_compact" -> Seq("boosted_even"),
    "q_ann_graph_rollback" -> Seq("boosted_even"),
    "q_ann_ivf_persist" -> Seq("ivf_m50"),
    "q_ann_ivf_delete" -> Seq("ivf_m50"),
    "q_ann_ivf_rollback" -> Seq("ivf_m50"),
    "q_ann_ivfpq_persist" -> Seq("pq_m25"),
    "q_ann_ivfpq_delete" -> Seq("pq_m25"),
    "q_ann_ivfpq_compact" -> Seq("pq_m25"))

  def run(spark: SparkSession, base: String, big: String, f: Int,
      names: Seq[String], routeCheck: Boolean = false): Unit = {
    val missing = names.filterNot(SparkEntry.queries.contains)
    require(missing.isEmpty, s"unknown queries: $missing")
    // Session warm-up (same rationale as Bench): pay classload/JIT once so
    // the first query's base measurement isn't inflated — a too-large
    // t_base UNDERSTATES ratios, which is the flattering direction; warm
    // up so the ratios are honest.
    spark.read.parquet(s"$base/region.parquet").count()
    SparkEntry.queries("q_filter_count")(spark, base).count()
    // Pre-charge the shared builds the selected set will touch, one
    // explicit row per (tree): the consumers below then time as pure
    // probes (build-once/probe-many is the artifact's own contract).
    val builders = graft.queries.SimilarityQueries.sharedBuilders ++
      graft.queries.MlQueries.sharedBuilders
    val buildRows = names.flatMap(sharedBuildsOf.getOrElse(_, Nil))
      .distinct.map { b =>
        val tBase = time(builders(b)(spark, base): Unit)
        val tBig = time(builders(b)(spark, big): Unit)
        val ratio = tBig / tBase
        println(f"""{"query":"build:$b","t_base":$tBase%.3f,"t_big":$tBig%.3f,"ratio":$ratio%.2f}""")
        (s"build:$b", tBase, tBig, ratio)
      }
    val rows = buildRows ++ names.map { name =>
      val fn = SparkEntry.queries(name)
      // min of 2 at base (short runs, relatively noisier); 1 at big.
      val tBase = math.min(time(fn(spark, base).count()),
        time(fn(spark, base).count()))
      val tBig = time(fn(spark, big).count())
      val ratio = tBig / tBase
      println(f"""{"query":"$name","t_base":$tBase%.3f,"t_big":$tBig%.3f,"ratio":$ratio%.2f}""")
      (name, tBase, tBig, ratio)
    }
    // Skew-mode evidence that q_asof_auto's routing actually FIRED: the
    // same skewProfile joinAuto consults, on both dirs' purchase probes —
    // the base profile should read cold (native merge), the skewed-big
    // profile hot (salted leg), confirming the histogram router live
    // rather than on planted spec toys.
    if (routeCheck) {
      def profile(dir: String) = {
        val probes = Tables.events(spark, dir)
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        graft.ops.AsOfJoin.skewProfile(probes, Seq("user_id"),
          sampleFraction = 1.0)
      }
      val (pb, pg) = (profile(base), profile(big))
      println(s"""{"metric":"asof_route","base_hot":${pb.hot},"big_hot":${pg.hot},"big_max_key_rows":${pg.maxKeyRows},"big_avg_partition_rows":${pg.avgPartitionRows.round},"big_salts":${pg.suggestedSalts}}""")
    }
    val worst = rows.maxBy(_._4)
    println(f"""{"metric":"scale_rehearsal","factor":$f,"queries_n":${rows.length},"t_base_total":${rows.map(_._2).sum}%.1f,"t_big_total":${rows.map(_._3).sum}%.1f,"worst":"${worst._1}","worst_ratio":${worst._4}%.2f}""")
  }
}
