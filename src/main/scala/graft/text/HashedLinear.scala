package graft.text

import graft.ops.Dedup
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** fastText-style linear text classifier INFERENCE over hashed token
  * features — the shape of every "quality classifier" pass a training-data
  * pipeline runs at corpus scale (CCNet / GPT-3-style quality filtering):
  * tokens hash into a fixed-dimension feature space, a broadcast weight
  * vector scores each document, a threshold keeps or drops it.
  *
  * Training happens offline elsewhere; what must scale is scoring 100 TB
  * of text, and that is embarrassingly parallel here: tokenize + hash is
  * one codegen'd projection, the weight table (`dim` rows — fastText
  * defaults to 2M buckets ≈ 16 MB of longs) broadcast-joins, and the
  * per-document sum is a key-partitioned partial aggregation. No UDF, no
  * model server round-trip, nothing driver-side.
  *
  * Weights are INTEGER MILLI-UNITS (BIGINT), not floats: a distributed
  * float dot-product re-associates, integer sums don't — so a score is
  * bit-identical across runs, partitionings, and engines (this is what
  * puts `q_quality_score` under the DuckDB oracle gate). Callers with
  * real-valued weights quantize once at broadcast time; 1e-3 resolution
  * dwarfs the noise floor of any text classifier.
  *
  * Feature hashing mirrors the corpus-wide discipline: md5 of the
  * normalized token, first 15 hex chars as a 60-bit integer, mod `dim` —
  * reproducible on any engine with md5 (same family as
  * [[graft.ops.Dedup.md5MinHashSignatures]]).
  */
object HashedLinear {

  /** 60-bit md5-derived feature id of a token column, in [0, dim). */
  def featureId(token: Column, dim: Int): Column =
    pmod(conv(substring(md5(token), 1, 15), 16, 10).cast("long"), lit(dim.toLong))

  /** Score every document: sum of `weight_milli` over token OCCURRENCES
    * (a token appearing k times contributes k·w — the bag-of-words dot
    * product), plus `biasMilli`. Documents with no tokens are dropped
    * (no features ⇒ no score; filter upstream if they must survive).
    *
    * @param weights (feature: LONG in [0,dim), weight_milli: LONG) —
    *   missing features weigh 0. Broadcast: keep `dim` ≲ tens of millions.
    * @return (idCol, score_milli: LONG, keep: BOOLEAN) with
    *   keep = score_milli + biasMilli > 0
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
      weights: DataFrame, dim: Int, biasMilli: Long = 0L): DataFrame = {
    val toks = docs
      .select(col(idCol),
        explode(split(Dedup.normalizeText(col(textCol)), " ")).as("__tok"))
      .filter(col("__tok") =!= "")
      .select(col(idCol), featureId(col("__tok"), dim).as("feature"))
    toks
      .join(broadcast(weights.select(col("feature"), col("weight_milli"))),
        Seq("feature"), "left")
      .groupBy(col(idCol))
      .agg((sum(coalesce(col("weight_milli"), lit(0L))) + lit(biasMilli))
        .as("score_milli"))
      .withColumn("keep", col("score_milli") > 0)
  }

  /** Deterministic synthetic weight table — a Knuth-multiplicative mix of
    * the feature id into [-1000, 1000] milli-units. Not a trained model:
    * it exists so specs and the cross-engine oracle can exercise the
    * scoring path with a weight vector any engine rebuilds from scratch
    * (`(f * 2654435761) % 2001 - 1000`; f < 2^21 keeps the product well
    * under 2^63 on both engines).
    */
  def syntheticWeights(spark: SparkSession, dim: Int): DataFrame = {
    require(dim <= (1 << 21), "synthetic mix constant overflows past 2^21 features")
    spark.range(dim.toLong).select(col("id").as("feature"),
      (pmod(col("id") * lit(2654435761L), lit(2001L)) - lit(1000L))
        .as("weight_milli"))
  }
}
