package graft.text

import graft.ops.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 relevance scoring (Robertson–Spärck Jones; the Lucene `+1` idf
  * variant, which keeps idf positive for terms in most documents) — the
  * standard retrieval scorer, and the ranking half of a RAG/search
  * pipeline over a curated corpus.
  *
  * Relational shape: the per-doc aggregation computes document length
  * AND every per-query-term frequency together (one conditional count
  * per term — the fixed query vocabulary rides as columns through a
  * single key-partitioned shuffle), then unpivots. The corpus-stats
  * branch (N, avgdl) re-aggregates the same subtree; column pruning
  * specializes it, so the corpus pays at most two token passes — score
  * and stats — never one per statistic. Callers scoring many queries
  * against one corpus should cache the tokenized per-doc table.
  * Per-(doc, term) scores come back for the caller to combine — summing
  * in a FIXED column order keeps the float64 arithmetic reproducible
  * across engines (a groupBy sum over doubles would re-associate).
  */
object Bm25 {

  /** Per-(doc, term) BM25 partial scores for `queryTerms`:
    * `idf(term) * tf·(k1+1) / (tf + k1·(1-b + b·dl/avgdl))` with
    * `idf = ln(1 + (N - df + 0.5)/(df + 0.5))`. Columns: idCol, term,
    * `score` (unrounded — combine, then round).
    */
  def termScores(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val toks = docs
      .select(col(idCol),
        explode(split(Dedup.normalizeText(col(textCol)), " ")).as("term"))
      .filter(col("term") =!= "")
    // One pass over the tokens: dl and every query-term tf in one agg.
    val tfCols = queryTerms.zipWithIndex.map { case (t, i) =>
      count(when(col("term") === t, lit(1))).as(s"__tf_$i")
    }
    val perDoc = toks.groupBy(col(idCol))
      .agg(count(lit(1)).as("__dl"), tfCols: _*)
    // Unpivot the fixed query vocabulary back to (doc, term, tf) rows.
    val tf = perDoc
      .select(col(idCol), col("__dl"),
        explode(array(queryTerms.zipWithIndex.map { case (t, i) =>
          struct(lit(t).as("term"), col(s"__tf_$i").as("__tf"))
        }: _*)).as("__e"))
      .select(col(idCol), col("__dl"),
        col("__e.term").as("term"), col("__e.__tf").as("__tf"))
      .filter(col("__tf") > 0)
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("__df"))
    // N and avgdl are exact-integer-derived doubles: identical anywhere.
    val stats = docs.agg(count(lit(1)).as("__n"))
      .crossJoin(broadcast(perDoc.agg(
        (sum(col("__dl")).cast("double") / count(lit(1))).as("__avgdl"))))
    val idf = log(lit(1.0) +
      (col("__n") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5)))
    val tfn = (col("__tf") * lit(k1 + 1.0)) /
      (col("__tf") + lit(k1) * (lit(1.0 - b) + lit(b) * (col("__dl") / col("__avgdl"))))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .select(col(idCol), col("term"), (idf * tfn).as("score"))
  }
}
