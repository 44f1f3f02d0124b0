package graft.text

import graft.ops.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 relevance scoring (Robertson–Spärck Jones; the Lucene `+1` idf
  * variant, which keeps idf positive for terms in most documents) — the
  * standard retrieval scorer, and the ranking half of a RAG/search
  * pipeline over a curated corpus.
  *
  * Relational shape, same discipline as [[TfIdf]]: one tokenize pass,
  * the query-term filter pushed into the explode (only matching terms
  * survive to the shuffle), per-doc term frequencies and document
  * lengths by key-partitioned partial aggregation, corpus stats (N,
  * avgdl) as one-row broadcasts. Per-(doc, term) scores come back for
  * the caller to combine — summing in a FIXED column order keeps the
  * float64 arithmetic reproducible across engines (a groupBy sum over
  * doubles would re-associate).
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
    val dl = toks.groupBy(idCol).agg(count(lit(1)).as("__dl"))
    val tf = toks.filter(col("term").isin(queryTerms: _*))
      .groupBy(idCol, "term").agg(count(lit(1)).as("__tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("__df"))
    // N and avgdl are exact-integer-derived doubles: identical anywhere.
    val stats = docs.agg(count(lit(1)).as("__n"))
      .crossJoin(broadcast(dl.agg(
        (sum(col("__dl")).cast("double") / count(lit(1))).as("__avgdl"))))
    val idf = log(lit(1.0) +
      (col("__n") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5)))
    val tfn = (col("__tf") * lit(k1 + 1.0)) /
      (col("__tf") + lit(k1) * (lit(1.0 - b) + lit(b) * (col("__dl") / col("__avgdl"))))
    tf.join(dfreq, "term")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))
      .select(col(idCol), col("term"), (idf * tfn).as("score"))
  }
}
