package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the training-data pipeline surface:
  * token counting, quality scoring, language ID, fingerprinting.
  *
  * Everything is a pure Catalyst expression tree (no UDFs) so the whole
  * document pass stays inside one WholeStageCodegen span and scales as a
  * single map-only stage over the corpus — the 100 TB shape: no shuffle at
  * all until an aggregate consumes these columns.
  */
object TextFunctions {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0L))
      .otherwise(size(split(trim(text), "\\s+")).cast("long"))

  /** BPE-ish subword count: word-piece regex (letters / digits / other
    * symbol runs), the usual pre-tokenizer approximation.
    */
  def subwordCount(text: Column): Column =
    size(filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)).cast("long") +
      size(filter(split(text, "[A-Za-z0-9\\s]+"), t => length(t) > 0)).cast("long")

  /** Punctuation-to-character ratio. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double") /
        length(text).cast("double"))

  /** Fraction of tokens that are in `stopwords` (lowercased exact match). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = split(trim(lower(text)), "\\s+")
    when(length(trim(text)) === 0, lit(0.0)).otherwise(
      size(filter(toks, t => t.isin(stopwords.map(lit): _*)))
        .cast("double") / size(toks).cast("double"))
  }

  /** Mean token length (characters). */
  def meanTokenLen(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    when(length(trim(text)) === 0, lit(0.0)).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        size(toks).cast("double"))
  }

  /** Composite quality score in [0,1]: length band + punct band + mean
    * token length band. Deterministic rule mix, oracle-replicable in SQL.
    */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val nTok = tokenCount(text)
    val lenOk = when(nTok.between(10, 100000), lit(0.4)).otherwise(lit(0.0))
    val punctOk = when(punctRatio(text) < 0.2, lit(0.3)).otherwise(lit(0.0))
    val stopOk = when(stopwordRatio(text, stopwords) > 0.05, lit(0.3)).otherwise(lit(0.0))
    lenOk + punctOk + stopOk
  }

  /** Language-ID marker words per language. On the synthetic corpus these
    * are function-word frequencies; the mechanism (per-language evidence
    * count → argmax with deterministic tie-break) is the real n-gram
    * heuristic shape.
    */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "es", "y"),
    "zh" -> Seq("的", "是", "了", "在", "和"))

  /** Evidence count for one language: occurrences of its marker tokens. */
  def langEvidence(text: Column, lang: String): Column = {
    val toks = split(trim(lower(text)), "\\s+")
    size(filter(toks, t => t.isin(langMarkers(lang).map(lit): _*))).cast("long")
  }

  /** Predicted language: argmax evidence, ties broken by language code
    * order, "und" (undetermined) when no marker hits at all.
    */
  def langId(text: Column): Column = {
    val langs = langMarkers.keys.toSeq.sorted
    val best = langs.map(l => struct(langEvidence(text, l).as("n"), lit(l).as("l")))
      .reduce((a, b) => when(b.getField("n") > a.getField("n"), b).otherwise(a))
    when(best.getField("n") === 0, lit("und")).otherwise(best.getField("l"))
  }

  /** Document fingerprint: content-defined rolling scheme — hash each
    * k-shingle, keep the minimum w per window position... simplified to the
    * robust winnowing-lite form: min xxhash64 over all k-shingles (a
    * deterministic 1-feature sketch) plus md5 of normalized text.
    */
  def fingerprint(text: Column, shingleSize: Int = 4): Column = {
    val sh = graft.ops.Dedup.shingles(text, shingleSize)
    when(size(sh) === 0, xxhash64(lit("")))
      .otherwise(array_min(transform(sh, s => xxhash64(s))))
  }
}
