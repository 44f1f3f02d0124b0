package graft.text

import graft.ops.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** T5-style span corruption (Raffel et al., JMLR 2020 §3.1.4): mask
  * contiguous token spans, replace each with a sentinel `<extra_id_k>`
  * in the encoder input, and emit the masked spans (each prefixed by its
  * sentinel) as the decoder target. The denoising-objective prep step a
  * training-data pipeline runs over every document.
  *
  * Determinism at scale: T5 samples spans; a relational engine cannot
  * (`rand()` breaks rerun/retry semantics), so span selection is a HASH
  * COIN on (doc, block) — tokens are tiled into stride-width blocks and
  * a block is masked (its first `spanLen` tokens) when its md5-derived
  * coin lands under `rate` tenths. Stride ≥ spanLen makes overlap
  * impossible by construction, which is what lets the whole transform
  * stay set-oriented: no sequential scan, no state. Sentinel numbering
  * is the per-doc rank of the masked block — a doc-keyed window over the
  * handful of masked blocks, not the tokens.
  *
  * Shape: one tokenize+posexplode, a distinct+window on (doc, block) for
  * ranks, a (doc, block)-keyed join back, and ONE doc-keyed aggregation
  * building both input and target (null-skipping collect_list + struct
  * sort, as [[LineDedup]]).
  */
object SpanCorruption {

  /** Returns (idCol, input_text, target_text): target is null for docs
    * where no block's coin fired. `rate` is in tenths (3 → 30% of
    * blocks).
    */
  def corrupt(docs: DataFrame, idCol: String, textCol: String,
      stride: Int = 5, spanLen: Int = 3, rate: Int = 3): DataFrame = {
    require(stride >= spanLen && spanLen >= 1, "need stride >= spanLen >= 1")
    require(rate >= 0 && rate <= 10, "rate is in tenths")
    val toks = docs.select(col(idCol),
        posexplode(split(Dedup.normalizeText(col(textCol)), " "))
          .as(Seq("pos", "tok")))
      .filter(col("tok") =!= "")
      .withColumn("blk", (col("pos") / lit(stride)).cast("long"))
      .withColumn("ib", col("pos") % lit(stride))
    val coin = pmod(Dedup.md5Hash60(
      concat(col(idCol).cast("string"), lit("_"), col("blk").cast("string"))),
      lit(10L)) < lit(rate.toLong)
    val ranked = toks.filter(coin).select(col(idCol), col("blk")).distinct()
      .withColumn("k",
        row_number().over(
          Window.partitionBy(col(idCol)).orderBy(col("blk"))) - lit(1))
    val m = toks.join(ranked, Seq(idCol, "blk"), "left")
      .withColumn("masked", col("k").isNotNull && col("ib") < lit(spanLen))
    val sentinel = concat(lit("<extra_id_"), col("k").cast("string"), lit(">"))
    val inputPiece = when(!col("masked"), col("tok"))
      .when(col("ib") === 0, sentinel)
    val targetPiece = when(col("masked"),
      when(col("ib") === 0, concat(sentinel, lit(" "), col("tok")))
        .otherwise(col("tok")))
    m.groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(when(inputPiece.isNotNull,
            struct(col("pos"), inputPiece.as("p"))))),
          x => x.getField("p")), " ").as("input_text"),
        nullif(array_join(transform(
          array_sort(collect_list(when(targetPiece.isNotNull,
            struct(col("k"), col("ib"), targetPiece.as("p"))))),
          x => x.getField("p")), " "), lit("")).as("target_text"))
  }
}
