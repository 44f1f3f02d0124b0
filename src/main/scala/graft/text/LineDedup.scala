package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level line deduplication, C4-style (Raffel et al., JMLR 2020
  * §2.2: web boilerplate — cookie notices, nav menus, footers — repeats
  * across millions of pages; C4 keeps ONE occurrence of every
  * three-sentence span corpus-wide). This is the line-granular variant
  * the practical pipelines run: every line that occurs more than once in
  * the corpus survives only at its FIRST occurrence (total order: doc id,
  * then position), and documents are reassembled from their surviving
  * lines in original order.
  *
  * Shape at scale: one line-keyed window (the only shuffle that carries
  * lines) decides keep/drop, then one doc-keyed aggregation reassembles.
  * The line-keyed exchange is the textbook place for skew — a boilerplate
  * line shared by 10M pages lands its 10M copies on one reducer — but the
  * per-line payload is (doc, pos) pairs, not documents, and the win is
  * exactly proportional to that duplication. A pre-combine per (line,
  * doc) would bound it further; not needed at observed dup rates.
  */
object LineDedup {

  /** Returns (idCol, text, n_kept, n_dropped): the reassembled document
    * (null when every line was dropped), surviving-line count, and
    * dropped-line count. Empty lines are discarded before arbitration.
    */
  def keepFirst(docs: DataFrame, idCol: String, textCol: String,
      sep: String = "\n"): DataFrame = {
    val lines = docs
      .select(col(idCol),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("pos", "line")))
      .filter(col("line") =!= "")
    val firstWins = Window.partitionBy(col("line"))
      .orderBy(col(idCol), col("pos"))
    val flagged = lines.withColumn("__keep",
      row_number().over(firstWins) === 1)
    // collect_list skips nulls, so the when() keeps only surviving lines;
    // array_sort on (pos, line) structs restores original order.
    flagged.groupBy(col(idCol))
      .agg(
        nullif(
          array_join(
            transform(
              array_sort(collect_list(when(col("__keep"),
                struct(col("pos"), col("line"))))),
              x => x.getField("line")),
            sep),
          lit("")).as("text"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("__keep"), 0L).otherwise(1L)).as("n_dropped"))
  }
}
