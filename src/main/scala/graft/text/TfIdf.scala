package graft.text

import graft.ops.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF term scoring over a document corpus — the classic keyword /
  * salience primitive for corpus exploration and near-duplicate triage.
  *
  * Fully relational: tokenize once (the same normalize-and-split used by
  * the dedup family, so fingerprints and term stats agree), count term
  * frequency per (doc, term), document frequency per term, then score
  * `tf * ln(N / df)` and keep the top-k terms per document.
  *
  * Scale shape: three key-partitioned shuffles — (doc, term) for tf,
  * (term) for df, (doc) for the top-k window — each with map-side
  * partial aggregation; the corpus size N is a one-row aggregate
  * broadcast into the score projection. No all-pairs stage anywhere, and
  * the per-doc window sorts only that document's distinct terms.
  */
object TfIdf {

  /** Top-`k` terms per document by `tf * ln(N/df)` (ties broken by term
    * ascending, so output is deterministic). Columns: idCol, term, tf
    * (long), tfidf (rounded to 4 decimals).
    */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val toks = docs
      .select(col(idCol),
        explode(split(Dedup.normalizeText(col(textCol)), " ")).as("term"))
      .filter(col("term") =!= "")
    val tf = toks.groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("__n_docs"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log(col("__n_docs").cast("double") / col("df")), 4))
    val w = Window.partitionBy(idCol).orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col(idCol), col("term"), col("tf"), col("tfidf"))
  }
}
