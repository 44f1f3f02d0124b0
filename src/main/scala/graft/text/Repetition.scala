package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style repetition signals (Rae et al., "Scaling Language Models:
  * Methods, Analysis & Insights from Training Gopher", §A1.1 repetition
  * filters): the fraction of a document made of repeated tokens / n-grams.
  * High values flag boilerplate, scraped navigation, and generation loops —
  * a standard pre-training quality gate alongside
  * [[TextFunctions.qualityScore]].
  *
  * Relational formulation, not per-row array lambdas: tokens and n-grams
  * are built in one codegen'd pass per document ([[graft.expr.WordShingles]]),
  * exploded with an n tag, and reduced by two partially-aggregated shuffles
  * — (id, n, gram) then (id, n) — plus a conditional-agg pivot back to one
  * row per document. A per-row `transform(array_distinct(...))` mode count
  * would run O(tokens²) interpreted per document; this shape shuffles only
  * (id, gram, count) and survives corpus growth: the widest exchange is the
  * gram explode, exactly like the n-gram Jaccard operator's.
  */
object Repetition {

  /** Per-document repetition profile over whitespace tokens:
    *
    *   - `n_tokens`: total tokens (normalized split, empty doc → 0-token
    *     convention of the shingle builder);
    *   - `dup_token_frac`: fraction of token occurrences beyond each
    *     token's first — (total - distinct) / total;
    *   - `top_bigram_frac`: occurrences of the most frequent bigram over
    *     all bigram occurrences;
    *   - `dup_trigram_frac`: fraction of trigram occurrences beyond first.
    *
    * Ratios are 0.0 when the document has no grams of that size. Rounded
    * to 4 decimals (oracle-stable).
    */
  def profile(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // ONE source scan: the three shingle builds run in a single
    // projection (tagged structs), then two generator steps unfold them —
    // a 3-way unionAll would read and decode the corpus three times.
    val grams = docs
      .select(col(idCol), explode(array(Seq(1, 2, 3).map { n =>
        struct(lit(n).as("__n"),
          graft.expr.WordShingles.shingles(col(textCol), n).as("__gs"))
      }: _*)).as("__e"))
      .select(col(idCol), col("__e.__n").as("__n"),
        explode(col("__e.__gs")).as("__g"))

    val perGram = grams
      .groupBy(col(idCol), col("__n"), col("__g"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol), col("__n"))
      .agg(sum("__c").as("__total"),
        count(lit(1)).as("__distinct"),
        max("__c").as("__top"))

    def pick(n: Int, c: String): Column = max(when(col("__n") === n, col(c)))
    val pivoted = perGram.groupBy(col(idCol)).agg(
      pick(1, "__total").as("__tok_total"),
      pick(1, "__distinct").as("__tok_distinct"),
      pick(2, "__total").as("__bg_total"),
      pick(2, "__top").as("__bg_top"),
      pick(3, "__total").as("__tg_total"),
      pick(3, "__distinct").as("__tg_distinct"))

    def frac(num: Column, den: Column): Column =
      when(den > 0, round(num.cast("double") / den.cast("double"), 4))
        .otherwise(lit(0.0))

    // Left join from the corpus so gram-free documents (empty text) still
    // get a profile row of zeros.
    docs.select(col(idCol))
      .join(pivoted, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__tok_total"), lit(0L)).as("n_tokens"),
        frac(col("__tok_total") - col("__tok_distinct"), col("__tok_total"))
          .as("dup_token_frac"),
        frac(col("__bg_top"), col("__bg_total")).as("top_bigram_frac"),
        frac(col("__tg_total") - col("__tg_distinct"), col("__tg_total"))
          .as("dup_trigram_frac"))
  }
}
