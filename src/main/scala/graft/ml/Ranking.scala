package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking-quality metrics — NDCG@k and MRR@k per query. The eval layer
  * for the retrieval stack (BM25, ANN top-k, RRF fusion, RAG passage
  * retrieval): given a RUN (ranked results per query) and graded
  * relevance LABELS, score how well the ranking put the relevant
  * documents first.
  *
  *   DCG@k  = Σ_{i ≤ k} (2^rel_i − 1) / log2(i + 1)   (Järvelin &
  *   Kekäläinen, TOIS 2002 — the graded-gain form every IR benchmark
  *   uses); NDCG@k = DCG@k / IDCG@k where IDCG is the DCG of the ideal
  *   reordering of that query's OWN labels; MRR@k = 1 / rank of the
  *   first relevant result (0 when none lands in the top k).
  *
  * Determinism: gains 2^rel − 1 are exact doubles for integer grades;
  * each term is one pow + one log2 + one divide (round(6) at the
  * readout absorbs the log2 ulps — the q_bm25 contract); per-query sums
  * add ≤ k terms, so reassociation noise is orders of magnitude under
  * the rounding grid. The ideal ordering ties on (rel DESC, doc DESC →
  * same gain either way) and is made total with a doc tie-break anyway
  * so both engines rank identically.
  *
  * Scale shape: the run prunes to rank ≤ k FIRST (k rows per query),
  * labels join by (query, doc) — both sides keyed, no fan-out; the
  * ideal ranking is a per-query window over that query's labels
  * (bounded by labels-per-query, the [[graft.ops.RobustStats]]
  * parallelism contract); one final partial-agg'd groupBy(query)
  * produces the metric row. Nothing is ever globally sorted.
  */
object Ranking {

  /** Per-query (n_ranked, n_rel, dcg, idcg, ndcg, mrr) at cutoff `k`.
    *
    * @param runs   (queryCol, docCol, rankCol) — rankCol is 1-based;
    *               rows past `k` are ignored
    * @param labels (queryCol, docCol, relCol) — integer grades, 0 =
    *               irrelevant; ranked docs with no label row count as 0
    */
  def ndcgMrrAtK(
      runs: DataFrame,
      labels: DataFrame,
      queryCol: String,
      docCol: String,
      rankCol: String,
      relCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val lab = labels.select(col(queryCol).as("__q"), col(docCol).as("__d"),
      col(relCol).cast("long").as("__rel"))
    val topk = runs
      .select(col(queryCol).as("__q"), col(docCol).as("__d"),
        col(rankCol).cast("long").as("__rk"))
      .filter(col("__rk") <= k)
      .join(lab, Seq("__q", "__d"), "left")
      .withColumn("__rel", coalesce(col("__rel"), lit(0L)))
    val gained = topk.withColumn("__term",
      (pow(lit(2.0), col("__rel")) - lit(1.0)) / log2(col("__rk") + lit(1L)))
    val dcg = gained.groupBy(col("__q"))
      .agg(count(lit(1)).as("n_ranked"),
        sum(when(col("__rel") > 0, 1L).otherwise(0L)).as("n_rel"),
        round(sum(col("__term")), 6).as("dcg"),
        round(max(when(col("__rel") > 0,
          lit(1.0) / col("__rk").cast("double"))), 6).as("__mrr"))
    // Ideal DCG from the query's OWN labels: rel DESC under a total
    // order, positions re-discounted 1..k.
    val iw = Window.partitionBy("__q")
      .orderBy(col("__rel").desc, col("__d").asc)
    val idcg = lab.filter(col("__rel") > 0)
      .withColumn("__irk", row_number().over(iw).cast("long"))
      .filter(col("__irk") <= k)
      .withColumn("__term",
        (pow(lit(2.0), col("__rel")) - lit(1.0)) / log2(col("__irk") + lit(1L)))
      .groupBy(col("__q"))
      .agg(round(sum(col("__term")), 6).as("idcg"))
    dcg.join(idcg, Seq("__q"), "left")
      .select(col("__q").as("query_id"), col("n_ranked"), col("n_rel"),
        col("dcg"), coalesce(col("idcg"), lit(0.0)).as("idcg"),
        when(coalesce(col("idcg"), lit(0.0)) > 0.0,
          round(col("dcg") / col("idcg"), 6)).otherwise(lit(0.0)).as("ndcg"),
        coalesce(col("__mrr"), lit(0.0)).as("mrr"))
  }
}
