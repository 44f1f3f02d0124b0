package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Chi-squared distinctive-term extraction: which tokens over-index in
  * each source vs the rest of the corpus — the "what is this slice MADE
  * of" report used for domain labeling, contamination triage, and
  * source-mix debugging.
  *
  * For each (source, term), the 2×2 contingency test
  * χ² = N·(o11·o22 − o12·o21)² / ((o11+o12)(o21+o22)(o11+o21)(o12+o22)).
  * Counts are exact integers; the χ² arithmetic runs in double with ONE
  * fixed expression tree, so identical inputs produce bit-identical
  * scores (and therefore identical rankings) on every engine — the same
  * float contract as `q_bm25`.
  *
  * Scale: two partial-agg'd counting shuffles (term×source, then the two
  * marginals derived from it — the corpus is never re-tokenized), one
  * broadcast of the tiny per-source marginals, and a top-k window that
  * sorts only each source's candidate terms.
  */
object Distinctive {

  /** Top `k` over-indexing terms per source with `minCount` corpus
    * support. @return (source, term, n_in_source, chi2)
    */
  def chiSquaredTerms(docs: DataFrame, sourceCol: String, textCol: String,
      k: Int, minCount: Long): DataFrame = {
    val toks = docs.select(col(sourceCol).as("source"),
        explode(split(Dedup.normalizeText(col(textCol)), " ")).as("term"))
      .filter(col("term") =!= "")
    val st = toks.groupBy("source", "term").agg(count(lit(1)).as("o11"))
    val termTot = st.groupBy("term").agg(sum("o11").as("__t"))
      .filter(col("__t") >= minCount)
    val srcTot = st.groupBy("source").agg(sum("o11").as("__s"))
    val n = st.agg(sum("o11").as("__n"))

    val d = (c: Column) => c.cast("double")
    val joined = st.join(termTot, "term").join(broadcast(srcTot), "source")
      .crossJoin(broadcast(n))
      .select(col("source"), col("term"), col("o11"),
        (col("__t") - col("o11")).as("o12"),
        (col("__s") - col("o11")).as("o21"),
        (col("__n") - col("__t") - col("__s") + col("o11")).as("o22"),
        col("__n"))
    // One fixed expression tree: every engine multiplies/divides in this
    // exact order, so the doubles agree bitwise.
    val diff = d(col("o11")) * d(col("o22")) - d(col("o12")) * d(col("o21"))
    val chi2 = d(col("__n")) * diff * diff /
      (d(col("o11") + col("o12")) * d(col("o21") + col("o22")) *
        d(col("o11") + col("o21")) * d(col("o12") + col("o22")))
    val w = Window.partitionBy("source")
      .orderBy(col("__chi2").desc, col("term").asc)
    joined
      // Only over-indexed terms (diff > 0): a χ² top-k without the sign
      // gate surfaces terms CONSPICUOUSLY ABSENT from a source too.
      .filter(diff > 0)
      .withColumn("__chi2", chi2)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .select(col("source"), col("term"), col("o11").as("n_in_source"),
        round(col("__chi2"), 4).as("chi2"))
  }
}
