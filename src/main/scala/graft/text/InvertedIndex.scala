package graft.text

import graft.ops.Dedup
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inverted-index materialization — the posting-list artifact behind any
  * corpus-scale retrieval layer ([[Bm25]] scores ad-hoc; this PERSISTS the
  * index a search service serves): one row per term with document
  * frequency, collection frequency, and the sorted posting list.
  *
  * Shape: tokenize once (codegen'd split), (doc, term) term frequencies by
  * key-partitioned partial aggregation, then one term-keyed aggregation
  * whose `collect_list` is sorted POST-hoc (`sort_array`) — collection
  * order is partition-dependent, the sorted list is not, so output is
  * rerun-identical. Posting entries render as `docId:tf` strings after
  * the struct sort (doc id is unique per term, so (doc, tf) struct order
  * == doc order on any engine).
  *
  * Scale guard: a stop-word's posting list is the corpus — one row holding
  * millions of entries. `maxDf` drops terms above the cut (exactly the
  * stop-shingle cap in [[graft.ops.Dedup.ngramJaccardSparse]]): retrieval
  * over capped indexes re-scores dropped terms as non-discriminative, and
  * `minDf` prunes the hapax tail that bloats index size without recall.
  * The df filter runs on the COUNT before any list materializes.
  */
object InvertedIndex {

  def build(docs: DataFrame, idCol: String, textCol: String,
      minDf: Long = 1L, maxDf: Long = Long.MaxValue): DataFrame = {
    require(minDf >= 1 && maxDf >= minDf, "need 1 <= minDf <= maxDf")
    val tf = docs
      .select(col(idCol),
        explode(split(Dedup.normalizeText(col(textCol)), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("__tf"))
    tf.groupBy(col("term"))
      .agg(
        count(lit(1)).as("df"),
        sum(col("__tf")).as("cf"),
        collect_list(struct(col(idCol).as("d"), col("__tf").as("tf")))
          .as("__p"))
      .filter(col("df") >= minDf && col("df") <= maxDf)
      .select(col("term"), col("df"), col("cf"),
        array_join(transform(sort_array(col("__p")),
          e => concat(e.getField("d").cast("string"), lit(":"),
            e.getField("tf").cast("string"))), ",").as("postings"))
  }

  /** Positional postings: one row per token occurrence (id, pos, term),
    * 0-based position — the index layout phrase and proximity queries
    * intersect. Scale shape: a single codegen'd tokenize + posexplode;
    * downstream consumers filter by term BEFORE joining, so each phrase
    * join moves only the matched terms' postings, never the corpus.
    */
  def positionalPostings(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol),
        posexplode(split(Dedup.normalizeText(col(textCol)), " "))
          .as(Seq("pos", "term")))
      .filter(col("term") =!= "")

  /** Exact-phrase search via positional-postings intersection (the
    * standard IR phrase plan — Manning et al., IR book §2.4): for phrase
    * t0…tk, each term's postings are start-aligned (pos − i) and
    * equi-joined on (doc, pos); surviving rows are phrase occurrences.
    * Returns (phrase, id, n_hits), docs without a hit absent. Every join
    * is term-filtered first, so it shuffles posting lists of the phrase's
    * terms only.
    */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
      phrases: Seq[String]): DataFrame = {
    require(phrases.nonEmpty, "need at least one phrase")
    val postings = positionalPostings(docs, idCol, textCol)
    phrases.map { phrase =>
      val terms = phrase.split(" ").toSeq
      val aligned = terms.zipWithIndex.map { case (t, i) =>
        postings.filter(col("term") === t)
          .select(col(idCol), (col("pos") - lit(i)).as("pos"))
      }
      aligned.reduce(_.join(_, Seq(idCol, "pos")))
        .groupBy(col(idCol))
        .agg(count(lit(1)).as("n_hits"))
        .select(lit(phrase).as("phrase"), col(idCol), col("n_hits"))
    }.reduce(_.unionByName(_))
  }

  /** Conjunctive (AND) lookup over the source corpus for `terms` — the
    * query-time contract the index serves; expressed here against the raw
    * corpus as the oracle-checkable reference semantics (a serving layer
    * would intersect the posting lists instead).
    */
  def lookupAll(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "need at least one term")
    val toks: Column = split(Dedup.normalizeText(col(textCol)), " ")
    docs.filter(terms.map(t => array_contains(toks, t)).reduce(_ && _))
      .select(col(idCol))
  }
}
