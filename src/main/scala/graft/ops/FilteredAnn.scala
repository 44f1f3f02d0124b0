package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Filtered ANN — top-k by cosine among the corpus rows satisfying a
  * metadata predicate, the standard vector-store query shape
  * ("nearest docs WHERE lang='en' AND source='web'"). Neither pure
  * strategy survives both regimes, so the operator ROUTES on measured
  * selectivity (the [[AsOfJoin]] auto-router discipline: probe cheap,
  * decide once, decision observable):
  *
  *   - SELECTIVE predicate (matching fraction ≤ threshold): PRE-FILTER
  *     exact — the qualifying rows are few enough that the partial-agg'd
  *     brute top-k ([[Similarity.bruteForceTopKAgg]]) over just them is
  *     both cheaper than any index probe AND exact. Filtering an IVF/LSH
  *     index instead would scan the same bytes for worse recall.
  *   - BROAD predicate: POST-FILTER over-fetch — run the bucketed ANN
  *     (LSH) for k·overFetch/frac candidates, filter, re-rank to k.
  *     Pre-filtering here would rebuild per-predicate index state; the
  *     over-fetch factor compensates for candidates lost to the filter
  *     (E[survivors] = fetched·frac ≥ k·overFetch ≥ k). Approximate,
  *     like the underlying ANN; may return < k rows when the bucket
  *     fan-out misses qualifying rows (reported honestly, never padded).
  *
  * The selectivity probe is ONE bounded aggregate (two longs) over the
  * predicate column — at 100 TB this reads the predicate column only
  * (column pruning) and is the same cost class as AsOfJoin.skewProfile.
  *
  * Both branches self-exclude (query ≠ neighbor), like the underlying
  * ops.
  *
  * @return (query_id, neighbor_id, rank) — rank 1 = nearest qualifying
  *         row; ≤ k rows per probe
  */
object FilteredAnn {

  /** The routing decision, exposed for specs and ops logging. */
  final case class Route(n: Long, matching: Long, frac: Double,
      preFilter: Boolean)

  def route(corpus: DataFrame, pred: Column,
      selectivityThreshold: Double): Route = {
    val r = corpus.agg(count(lit(1)).as("n"),
      count(when(pred, 1)).as("m")).head
    val n = r.getLong(0)
    val m = r.getLong(1)
    val frac = if (n == 0) 0.0 else m.toDouble / n
    Route(n, m, frac, preFilter = frac <= selectivityThreshold)
  }

  def topK(probes: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, pred: Column, k: Int,
      selectivityThreshold: Double = 0.1, overFetch: Double = 3.0,
      numPlanes: Int = 8, tables: Int = 2): DataFrame =
    topKImpl(probes, corpus, idCol, vecCol, pred, k,
      selectivityThreshold, overFetch,
      (p, c, fetch) => Similarity.lshTopK(p, c, idCol, vecCol, fetch,
        numPlanes, tables))

  /** [[topK]] on md5-derived planes — the oracle-parity variant (the
    * lshTopKMd5 relationship): a SQL engine replays the broad branch's
    * buckets, over-fetch cut and re-rank exactly (`q_ann_filtered_broad`).
    */
  def topKMd5(probes: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, pred: Column, k: Int, dims: Int,
      selectivityThreshold: Double = 0.1, overFetch: Double = 3.0,
      numPlanes: Int = 6, tables: Int = 2): DataFrame =
    topKImpl(probes, corpus, idCol, vecCol, pred, k,
      selectivityThreshold, overFetch,
      (p, c, fetch) => Similarity.lshTopKMd5(p, c, idCol, vecCol, fetch,
        dims, numPlanes, tables))

  /** The SELECTIVE branch, shared by every router: exact top-k among the
    * qualifying rows only. bruteForceTopKAgg's partial top-k keeps the
    * shuffle at O(partitions·k), and the corpus side is already cut to
    * the matching fraction before any scoring. The typed aggregator's
    * state is (long, double) pairs, so non-integral ids take the
    * window-form brute instead (same rows; shuffles the scored pairs
    * rather than partial top-ks — integral ids are the shape to prefer
    * at scale, but a string-keyed corpus must not throw on one branch
    * while the other serves it).
    */
  private def selectiveTopK(probes: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, pred: Column, k: Int): DataFrame = {
    val integral = corpus.select(col(idCol)).schema.head.dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    if (integral)
      Similarity.bruteForceTopKAgg(probes, corpus.filter(pred),
        idCol, vecCol, k)
    else
      Similarity.bruteForceTopK(probes, corpus.filter(pred),
        idCol, vecCol, k)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** [[topK]] with the broad branch on the GRAPH path — filtered ANN the
    * way a graph index serves it (filtered-HNSW semantics): the walk's
    * BEAM is the over-fetch pool. A selective predicate still routes to
    * the exact pre-filter brute — an index probe cannot beat scoring the
    * few qualifying rows, and restricting the walk itself to qualifying
    * nodes destroys navigability (the classic in-walk-filter failure);
    * a broad one walks the FULL graph returning its whole beam
    * (`GraphSearch.topK` with k = beam), post-filters by the predicate,
    * and re-ranks to k. Size `beam ≥ k·overFetch/expected-frac`; like
    * the LSH branch, shortfall is reported honestly (< k rows), never
    * padded. Graph-path ids are long-cast by [[GraphSearch]] — integral
    * ids only, unlike the LSH router.
    */
  def topKGraph(graph: DataFrame, gSrcCol: String, gDstCol: String,
      probes: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, pred: Column, k: Int, beam: Int,
      selectivityThreshold: Double = 0.1, rounds: Int = 3,
      entries: Int = 8, overlay: Int = 2, salt: String = "gs",
      simPrecision: Int = -1): DataFrame = {
    require(k >= 1 && beam >= k, s"need beam >= k >= 1; got $beam/$k")
    val rt = route(corpus, pred, selectivityThreshold)
    if (rt.preFilter)
      selectiveTopK(probes, corpus, idCol, vecCol, pred, k)
    else {
      val qual = corpus.filter(pred).select(col(idCol).as("neighbor_id"))
      // Post-filter re-rank by the walk's own rank: within a probe the
      // walk already ordered by (cos desc, neighbor asc), so rank-order
      // survival is exactly cos-order survival.
      val w = Window.partitionBy("query_id").orderBy(col("rank").asc)
      GraphSearch.topK(graph, gSrcCol, gDstCol, corpus, idCol, vecCol,
          probes, idCol, vecCol, k = beam, beam = beam, rounds = rounds,
          entries = entries, overlay = overlay, salt = salt,
          simPrecision = simPrecision)
        // The walk keeps the probe's own node (rank 1 when probes come
        // from the corpus); the selective branch's brute self-excludes —
        // drop self here too or the object's both-branches-self-exclude
        // contract would flip on measured selectivity.
        .filter(col("query_id") =!= col("neighbor_id"))
        .join(qual, Seq("neighbor_id"), "left_semi")
        .withColumn("__fr", row_number().over(w))
        .filter(col("__fr") <= k)
        .select(col("query_id"), col("neighbor_id"),
          col("__fr").cast("int").as("rank"))
    }
  }

  private def topKImpl(probes: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, pred: Column, k: Int,
      selectivityThreshold: Double, overFetch: Double,
      ann: (DataFrame, DataFrame, Int) => DataFrame): DataFrame = {
    require(k >= 1 && overFetch >= 1.0,
      s"need k>=1, overFetch>=1; got $k/$overFetch")
    val rt = route(corpus, pred, selectivityThreshold)
    if (rt.preFilter) {
      selectiveTopK(probes, corpus, idCol, vecCol, pred, k)
    } else {
      // Over-fetch enough that the EXPECTED post-filter survivors still
      // cover k (capped at the matching count — fetching past every
      // qualifying row is wasted work).
      val fetch = math.min(rt.matching,
        math.ceil(k * overFetch / math.max(rt.frac, 1e-9)).toLong)
        .min(Int.MaxValue.toLong).toInt
      // Keep the id's NATIVE type: the semi-join matches lshTopK's
      // neighbor_id as-is. A cast("long") here would null out string ids
      // and silently empty the broad branch while the selective branch
      // (no cast) kept working — the output would flip on measured
      // selectivity alone.
      val qual = corpus.filter(pred)
        .select(col(idCol).as("neighbor_id"))
      val w = Window.partitionBy("query_id")
        .orderBy(col("cos").desc, col("neighbor_id").asc)
      ann(probes, corpus, fetch)
        .join(qual, Seq("neighbor_id"), "left_semi")
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
    }
  }
}
