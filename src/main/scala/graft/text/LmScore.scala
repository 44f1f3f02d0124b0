package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.expr.WordShingles

/** Perplexity-style quality scoring: each document's average bigram
  * log-likelihood under the corpus's own MLE bigram model — the classic
  * "train a cheap LM on the corpus, drop what it finds surprising"
  * curation filter (CCNet/KenLM-shaped, with the corpus itself as the
  * reference distribution). Low `avg_logp` = improbable word sequences:
  * boilerplate soup, lorem-ipsum, OCR noise.
  *
  * Determinism: p(w2|w1) = c12/c1 divides exact longs in float64 —
  * identical everywhere. Per-document term sums are ordered (sorted by
  * bigram before a left-to-right fold), so accumulation can't vary with
  * partitioning; the oracle sums the same order. `ln` last-ulp noise is
  * absorbed by round(4), the same contract as `q_bm25`.
  *
  * Scale shape: doc-level bigram counts shuffle once keyed on
  * (doc, w1, w2) with map-side combine; the corpus model DERIVES from
  * that table (never re-reads text); the model join is keyed on (w1, w2)
  * — the model is corpus-sized, so it is joined, not broadcast. The only
  * per-doc materialization is the distinct-bigram term list, bounded by
  * document length.
  */
object LmScore {

  /** (doc_id, n_bigrams, avg_logp) per document with ≥1 bigram. */
  def avgLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bg = docs
      .select(col(idCol).as("doc_id"),
        explode(WordShingles.shingles(col(textCol), 2)).as("__bg"))
      .select(col("doc_id"),
        split(col("__bg"), " ").getItem(0).as("__w1"),
        split(col("__bg"), " ").getItem(1).as("__w2"))
    val docPair = bg.groupBy("doc_id", "__w1", "__w2")
      .agg(count(lit(1)).as("__cnt"))
    val pair = docPair.groupBy("__w1", "__w2").agg(sum("__cnt").as("__c12"))
    val uni = pair.groupBy("__w1").agg(sum("__c12").as("__c1"))
    val probs = pair.join(uni, "__w1")
      .select(col("__w1"), col("__w2"),
        (col("__c12").cast("double") / col("__c1").cast("double")).as("__p"))

    val terms = docPair.join(probs, Seq("__w1", "__w2"))
      .select(col("doc_id"), col("__cnt"),
        struct(col("__w1"), col("__w2"),
          (col("__cnt").cast("double") * log(col("__p"))).as("__t")).as("__term"))
    terms.groupBy("doc_id")
      .agg(sum(col("__cnt")).as("n_bigrams"),
        sort_array(collect_list(col("__term"))).as("__ts"))
      .select(col("doc_id"), col("n_bigrams"),
        round(aggregate(col("__ts"), lit(0.0), (acc, x) =>
          acc + x.getField("__t")) / col("n_bigrams"), 4).as("avg_logp"))
  }
}
