package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The Gopher document-quality rules (Rae et al. 2021, app. A1.1) — the
  * rule battery modern web-scale curation pipelines (RefinedWeb /
  * FineWeb lineage) apply before any model-based filtering:
  *
  *   1. word count in [50, 100 000];
  *   2. mean word length in [3, 10];
  *   3. symbol-to-word ratio ("#" and ellipsis) ≤ 0.1;
  *   4. ≤ 90% of lines start with a bullet;
  *   5. ≤ 30% of lines end with an ellipsis;
  *   6. ≥ 80% of words contain at least one alphabetic character;
  *   7. at least 2 of the required stop words appear.
  *
  * Everything is a pure Catalyst expression tree over the text column
  * (array lambdas + string builtins, no UDFs), so the whole battery is
  * one map-only codegen'd pass — the same 100 TB shape as
  * [[TextFunctions]]: no shuffle until something aggregates the
  * verdicts. Words are RAW whitespace tokens (the paper's reading);
  * only the stop-word probe lowercases.
  */
object GopherRules {

  /** The paper's required stop words (rule 7). */
  val RequiredStopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Full rule report as one struct column: the raw metrics plus one
    * boolean per rule plus the conjunction `pass`. Null text is the
    * caller's problem (filter upstream) — every metric on a null text is
    * null and `pass` is null, never a false positive.
    */
  def report(text: Column): Column = {
    val words = split(trim(text), "\\s+")
    val wc = when(length(trim(text)) === 0, lit(0L))
      .otherwise(size(words).cast("long"))
    val sumLen = aggregate(words, lit(0L),
      (a, w) => a + length(w).cast("long"))
    val meanLen = when(wc === 0, lit(0.0))
      .otherwise(sumLen.cast("double") / wc.cast("double"))

    // Symbols: '#' plus both ellipsis spellings; counted via
    // length-difference (no regex scan needed).
    val hashes = (length(text) - length(translate(text, "#", ""))).cast("long")
    val dots = ((length(text) -
      length(replace(text, lit("..."), lit("")))) / 3).cast("long")
    val uniEll = (length(text) - length(translate(text, "…", ""))).cast("long")
    val symbolRatio = when(wc === 0, lit(1.0))
      .otherwise((hashes + dots + uniEll).cast("double") / wc.cast("double"))

    val lines = split(text, "\n")
    val nLines = size(lines).cast("long")
    def startsBullet(l: Column): Column = {
      val t = ltrim(l)
      t.startsWith("-") || t.startsWith("*") || t.startsWith("•")
    }
    def endsEllipsis(l: Column): Column = {
      val t = rtrim(l)
      t.endsWith("...") || t.endsWith("…")
    }
    val bulletRatio = size(filter(lines, startsBullet(_)))
      .cast("double") / nLines.cast("double")
    val ellipsisRatio = size(filter(lines, endsEllipsis(_)))
      .cast("double") / nLines.cast("double")

    val alphaRatio = when(wc === 0, lit(0.0))
      .otherwise(size(filter(words, w => w.rlike("[A-Za-z]")))
        .cast("double") / wc.cast("double"))
    val stopHits = size(array_intersect(
      transform(words, w => lower(w)),
      array(RequiredStopWords.map(lit): _*))).cast("long")

    val rWc = wc.between(50L, 100000L)
    val rMean = meanLen.between(3.0, 10.0)
    val rSymbol = symbolRatio <= 0.1
    val rBullet = bulletRatio <= 0.9
    val rEllipsis = ellipsisRatio <= 0.3
    val rAlpha = alphaRatio >= 0.8
    val rStop = stopHits >= 2L

    struct(
      wc.as("word_count"),
      round(meanLen, 4).as("mean_word_len"),
      round(symbolRatio, 4).as("symbol_ratio"),
      round(bulletRatio, 4).as("bullet_ratio"),
      round(ellipsisRatio, 4).as("ellipsis_ratio"),
      round(alphaRatio, 4).as("alpha_ratio"),
      stopHits.as("stop_hits"),
      rWc.as("r_word_count"), rMean.as("r_mean_word_len"),
      rSymbol.as("r_symbol"), rBullet.as("r_bullet"),
      rEllipsis.as("r_ellipsis"), rAlpha.as("r_alpha"),
      rStop.as("r_stop_words"),
      (rWc && rMean && rSymbol && rBullet && rEllipsis && rAlpha && rStop)
        .as("pass"))
  }
}
