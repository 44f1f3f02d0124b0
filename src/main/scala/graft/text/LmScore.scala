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

  /** (doc_id, (__w1, __w2), count) + corpus pair counts shared by both
    * estimators.
    */
  private def bigramCounts(docs: DataFrame, idCol: String,
      textCol: String): (DataFrame, DataFrame) = {
    // Fan the corpus out before the shingle explode: the explode + the
    // per-(doc, bigram) partial aggregation are the scorer's CPU wall,
    // and on a single-input-partition source they run on one core
    // (graft.ops.FanOut — identity when the input is already wide).
    val bg = graft.ops.FanOut(docs.select(col(idCol), col(textCol)))
      .select(col(idCol).as("doc_id"),
        explode(WordShingles.shingles(col(textCol), 2)).as("__bg"))
      .select(col("doc_id"),
        split(col("__bg"), " ").getItem(0).as("__w1"),
        split(col("__bg"), " ").getItem(1).as("__w2"))
    // Both frames are multiply referenced downstream (docPair by the score
    // join and the model derivation; pair by up to four model statistics
    // in the KN variant) — truncate lineage so the text explodes and
    // first-level aggregations run once, not once per reference.
    val docPair = bg.groupBy("doc_id", "__w1", "__w2")
      .agg(count(lit(1)).as("__cnt"))
      .localCheckpoint(false)
    val pair = docPair.groupBy("__w1", "__w2").agg(sum("__cnt").as("__c12"))
      .localCheckpoint(false)
    (docPair, pair)
  }

  /** Shared per-document reduction over (doc_id, __cnt, __w1, __w2, __p
    * [, __unseen]) rows: ordered fold of cnt·ln(p) terms, so accumulation
    * can't vary with partitioning. When the input carries an `__unseen`
    * flag (cross-corpus scoring), the unseen-bigram count comes out as
    * `n_unseen`.
    */
  private def foldDoc(rows: DataFrame, outCol: String): DataFrame = {
    val hasUnseen = rows.columns.contains("__unseen")
    val unseenAgg =
      if (hasUnseen)
        Seq(sum(when(col("__unseen"), col("__cnt")).otherwise(0L)).as("n_unseen"))
      else Seq.empty
    val folded = rows
      .groupBy("doc_id")
      .agg(sum(col("__cnt")).as("n_bigrams"),
        (sort_array(collect_list(struct(col("__w1"), col("__w2"),
          (col("__cnt").cast("double") * log(col("__p"))).as("__t"))))
          .as("__ts") +: unseenAgg): _*)
    val base = folded.select((Seq(col("doc_id"), col("n_bigrams"),
      round(aggregate(col("__ts"), lit(0.0), (acc, x) =>
        acc + x.getField("__t")) / col("n_bigrams"), 4).as(outCol)) ++
      (if (hasUnseen) Seq(col("n_unseen")) else Seq.empty)): _*)
    base
  }

  private def docAvg(docPair: DataFrame, probs: DataFrame,
      outCol: String): DataFrame =
    foldDoc(docPair.join(probs, Seq("__w1", "__w2")), outCol)

  /** (doc_id, n_bigrams, avg_logp) per document with ≥1 bigram. */
  def avgLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val (docPair, pair) = bigramCounts(docs, idCol, textCol)
    val uni = pair.groupBy("__w1").agg(sum("__c12").as("__c1"))
    val probs = pair.join(uni, "__w1")
      .select(col("__w1"), col("__w2"),
        (col("__c12").cast("double") / col("__c1").cast("double")).as("__p"))
    docAvg(docPair, probs, "avg_logp")
  }

  /** Interpolated Kneser–Ney bigram scoring (Kneser & Ney 1995; Chen &
    * Goodman 1999) — the smoothing real KenLM-style curation models use,
    * where MLE assigns zero mass to unseen continuations and overrates
    * words that only ever follow one context ("Francisco" after "San"):
    *
    *   P_KN(w|v) = max(c(vw) − d, 0)/c(v) + d·N1+(v·)/c(v) · N1+(·w)/N1+(··)
    *
    * Every statistic is a relational aggregate over the SAME pair-count
    * table MLE uses: N1+(v·) and N1+(·w) are row counts of the pair
    * table grouped each way, N1+(··) its total row count (a 1-row
    * broadcast). Exact longs into float64 with one fixed
    * parenthesization, so any engine reproduces the scores bit-for-bit.
    * Scores every (doc, bigram) seen in the corpus model — unseen-bigram
    * backoff never arises in self-scoring, so the discount mass shows up
    * purely as the continuation-probability interpolation.
    */
  def knAvgLogProb(docs: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1, "absolute discount must be in (0,1)")
    val (docPair, pair) = bigramCounts(docs, idCol, textCol)
    val uni = pair.groupBy("__w1")
      .agg(sum("__c12").as("__c1"), count(lit(1)).as("__n1v"))
    val contW = pair.groupBy("__w2").agg(count(lit(1)).as("__n1w"))
    val tot = pair.agg(count(lit(1)).as("__T"))
    val d = lit(discount)
    val probs = pair.join(uni, "__w1").join(contW, "__w2")
      .crossJoin(broadcast(tot))
      .select(col("__w1"), col("__w2"),
        (greatest(col("__c12").cast("double") - d, lit(0.0)) /
            col("__c1").cast("double") +
          (d * col("__n1v").cast("double") / col("__c1").cast("double")) *
            (col("__n1w").cast("double") / col("__T").cast("double"))).as("__p"))
    docAvg(docPair, probs, "avg_klogp")
  }

  /** Cross-corpus Kneser–Ney scoring — the CCNet/KenLM curation shape:
    * the model trains on a REFERENCE corpus and every target document is
    * scored under it, so "surprising" means "unlike the reference", not
    * "unlike the noise around it". Backoff now actually fires:
    *
    *   - seen (v,w): the interpolated KN formula;
    *   - seen v, unseen w after it: λ(v)·P_cont(w) (the discount mass);
    *   - unseen v: P_cont(w) alone;
    *   - and the result floors at `floor` so a continuation the model has
    *     never seen anywhere scores ln(floor), not −∞ (the deterministic
    *     UNK convention, mirrored by the oracle).
    *
    * Output adds `n_unseen` — the OOV-bigram count, itself a standard
    * quality signal. Scale shape: model tables derive once from the
    * reference corpus; target bigrams join them on (w1) and (w2) —
    * vocabulary-sized sides, broadcastable — and the type total rides a
    * 1-row broadcast.
    */
  def knCrossScore(modelDocs: DataFrame, targetDocs: DataFrame,
      idCol: String, textCol: String, discount: Double = 0.75,
      floor: Double = 1e-10): DataFrame = {
    require(discount > 0 && discount < 1, "absolute discount must be in (0,1)")
    val (_, pair) = bigramCounts(modelDocs, idCol, textCol)
    val (targetPair, _) = bigramCounts(targetDocs, idCol, textCol)
    val uni = pair.groupBy("__w1")
      .agg(sum("__c12").as("__c1"), count(lit(1)).as("__n1v"))
    val contW = pair.groupBy("__w2").agg(count(lit(1)).as("__n1w"))
    val tot = pair.agg(count(lit(1)).as("__T"))
    val d = lit(discount)
    val pcont = coalesce(col("__n1w"), lit(0L)).cast("double") /
      col("__T").cast("double")
    val scored = targetPair
      .join(pair, Seq("__w1", "__w2"), "left")
      .join(uni, Seq("__w1"), "left")
      .join(contW, Seq("__w2"), "left")
      .crossJoin(broadcast(tot))
      .select(col("doc_id"), col("__cnt"), col("__w1"), col("__w2"),
        greatest(
          when(col("__c1").isNull, pcont)
            .otherwise(
              greatest(coalesce(col("__c12"), lit(0L)).cast("double") - d,
                  lit(0.0)) / col("__c1").cast("double") +
                (d * col("__n1v").cast("double") / col("__c1").cast("double")) *
                  pcont),
          lit(floor)).as("__p"),
        col("__c12").isNull.as("__unseen"))
    foldDoc(scored, "avg_klogp")
  }
}
