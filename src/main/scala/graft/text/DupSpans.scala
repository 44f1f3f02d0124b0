package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ExactSubstr-style duplicated-SPAN removal (Lee et al., "Deduplicating
  * Training Data Makes Language Models Better", ACL 2022): a token
  * window that occurs at two or more (doc, position) sites corpus-wide
  * marks every position it covers; overlapping/adjacent marked windows
  * merge into maximal spans; the spans are excised and the document
  * rebuilt from the surviving tokens. This removes the verbatim-repeated
  * SUBSTRINGS (license boilerplate, templated passages, mirrored
  * paragraphs) that document-level and near-dup dedup both miss — the
  * reference paper's suffix-array construction re-expressed in the four
  * relational moves Spark already optimizes:
  *
  *   1. window hashes by position — one codegen'd shingle pass, then the
  *      16-hex-char prefix of md5 moves through the shuffle, never the
  *      window text;
  *   2. duplicated-window detection — one hash-keyed partial-agg'd count
  *      (map-side combine does the heavy lifting: a window repeated 1000×
  *      in a partition ships once);
  *   3. span merge — the islands trick: per-doc window over marked
  *      positions, gap > L starts a new island (doc-sized partitions, no
  *      global sort);
  *   4. rebuild — spans (tiny: one row per doc WITH spans) join back to
  *      the corpus and a single higher-order filter drops covered tokens
  *      map-side. Token arrays never shuffle.
  *
  * Tokenization/normalization is [[graft.expr.WordShingles]]' canonical
  * form (lower → collapse → trim → split), so span keys agree with every
  * other dedup operator's keys.
  */
object DupSpans {

  /** Per-document span-removal result:
    * (id, n_tokens, n_spans, n_removed, dup_frac, clean text).
    * Documents with no duplicated span pass through with n_spans = 0 and
    * clean = normalized original. Documents shorter than `L` tokens have
    * no windows and likewise pass through.
    */
  def removeDuplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
      L: Int): DataFrame = {
    require(L >= 2, "span window must be >= 2 tokens")
    val grams = docs.select(col(idCol),
        posexplode(graft.expr.WordShingles.shingles(col(textCol), L,
          distinct = false)).as(Seq("__pos", "__g")))
      .select(col(idCol), col("__pos"),
        substring(md5(col("__g")), 1, 16).as("__h"))

    // Corpus-wide duplicated windows (count over the hash, partial-agg'd).
    val dupH = grams.groupBy(col("__h"))
      .agg(count(lit(1)).as("__c"))
      .filter(col("__c") > 1)
      .select(col("__h"))

    val marked = grams.join(dupH, Seq("__h"), "left_semi")
      .select(col(idCol), col("__pos"))

    // Islands: a marked start further than L from its predecessor opens a
    // new span (window i covers [i, i+L-1], so starts within L merge).
    val w = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
    val spans = marked
      .withColumn("__new",
        when(col("__pos") - lag(col("__pos"), 1, -L - 1).over(w) > L, 1)
          .otherwise(0))
      .withColumn("__island", sum(col("__new")).over(w))
      .groupBy(col(idCol), col("__island"))
      .agg(min(col("__pos")).as("s"), (max(col("__pos")) + L - 1).as("e"))

    val docSpans = spans.groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("__spans"),
        count(lit(1)).cast("long").as("n_spans"),
        sum(col("e") - col("s") + 1).as("n_removed"))

    val toks = graft.expr.WordShingles.shingles(col(textCol), 1,
      distinct = false)
    val noSpans = array().cast("array<struct<s:int,e:int>>")
    docs.join(docSpans, Seq(idCol), "left")
      .select(col(idCol), toks.as("__toks"),
        coalesce(col("__spans"), noSpans).as("__spans"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"))
      .select(col(idCol),
        size(col("__toks")).cast("long").as("n_tokens"),
        col("n_spans"), col("n_removed"),
        array_join(filter(col("__toks"),
          (_: Column, i: Column) => !exists(col("__spans"),
            sp => i >= sp.getField("s") && i <= sp.getField("e"))), " ")
          .as("clean"))
      .withColumn("dup_frac",
        when(col("n_tokens") > 0,
          round(col("n_removed") / col("n_tokens"), 4)).otherwise(lit(0.0)))
  }
}
