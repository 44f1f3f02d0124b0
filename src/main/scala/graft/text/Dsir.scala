package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expr.WordShingles
import graft.ops.Dedup

/** DSIR-style hashed n-gram importance weighting (Xie et al., "Data
  * Selection for Language Models via Importance Resampling", NeurIPS
  * 2023): score every raw document by how much more likely its features
  * are under a TARGET domain than under the raw corpus —
  *
  *   log w(x) = Σ_b n_b(x) · [ln p̂_target(b) − ln p̂_raw(b)]
  *
  * over B hashed bigram buckets with Laplace smoothing. High-weight
  * documents "look like" the target domain; resampling the raw corpus by
  * these weights (see `graft.ops.Sampling`'s weighted sampler) is the
  * DSIR pipeline. Both bag-of-hashed-ngram distributions are estimated
  * from the corpus itself, so the whole operator is two bounded
  * aggregations plus a bucket-keyed join — no model artifacts.
  *
  * Determinism (the [[LmScore]] contract): bucket counts are exact longs
  * (md5-derived 60-bit hashes mod B, engine-reproducible); the smoothed
  * probabilities divide exact integers in float64; per-document term sums
  * fold in bucket order so partitioning can't reorder the accumulation;
  * round(4) absorbs `ln` last-ulp noise.
  *
  * Scale shape: one (doc, bucket)-keyed shuffle with map-side combine
  * builds the per-doc feature counts; BOTH corpus distributions derive
  * from that table (the text is never re-read); the model is ≤ B rows —
  * broadcast-sized by construction, so the scoring join is map-only. The
  * only per-doc materialization is the ≤ B-entry term list.
  */
object Dsir {

  /** (doc_id, n_feats, log_weight) per document with ≥1 bigram.
    *
    * @param isTarget predicate over `docs` rows selecting the target
    *                 domain sample
    * @param buckets  hashed feature-space size B
    * @param alpha    Laplace smoothing mass per bucket
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 1024, alpha: Double = 1.0): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    require(alpha > 0.0, s"alpha must be > 0 (unsmoothed logs diverge), got $alpha")
    val db = docs
      .select(col(idCol).as("doc_id"),
        explode(WordShingles.shingles(col(textCol), 2)).as("__bg"))
      .select(col("doc_id"),
        pmod(Dedup.md5Hash60(col("__bg")), lit(buckets.toLong)).as("__b"))
      .groupBy("doc_id", "__b").agg(count(lit(1)).as("__cnt"))
      // Referenced three times (raw totals, target totals, scoring join):
      // truncate so the explode+hash+count pipeline runs once.
      .localCheckpoint(eager = false)
    val raw = db.groupBy("__b").agg(sum("__cnt").as("__cr"))
    val tgtIds = docs.filter(isTarget).select(col(idCol).as("doc_id"))
    val tgt = db.join(tgtIds, Seq("doc_id"), "left_semi")
      .groupBy("__b").agg(sum("__cnt").as("__ct"))
    val totals = raw.agg(sum(col("__cr")).as("__R")).crossJoin(
      tgt.agg(coalesce(sum(col("__ct")), lit(0L)).as("__T")))
    val model = raw.join(tgt, Seq("__b"), "left")
      .crossJoin(broadcast(totals))
      .select(col("__b"),
        ((coalesce(col("__ct"), lit(0L)) + lit(alpha)) /
          (col("__T") + lit(alpha * buckets))).as("__pt"),
        ((col("__cr") + lit(alpha)) /
          (col("__R") + lit(alpha * buckets))).as("__pr"))
    val terms = db.join(broadcast(model), Seq("__b"))
      .select(col("doc_id"), col("__cnt"),
        struct(col("__b"),
          (col("__cnt").cast("double") *
            (log(col("__pt")) - log(col("__pr")))).as("__t")).as("__term"))
    terms.groupBy("doc_id")
      .agg(sum(col("__cnt")).as("n_feats"),
        sort_array(collect_list(col("__term"))).as("__ts"))
      .select(col("doc_id"), col("n_feats"),
        // `+ 0.0` folds a rounded −0.0 to 0.0 (negative-zero contract
        // shared with the oracle SQL).
        (round(aggregate(col("__ts"), lit(0.0),
          (acc, x) => acc + x.getField("__t")), 4) + lit(0.0)).as("log_weight"))
  }
}
