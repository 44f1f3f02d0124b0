package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier/ranker evaluation statistics, kept integer-exact so the
  * numbers gate cross-engine (the quality-classifier twin of the dedup
  * family's confusion-matrix eval).
  */
object Eval {

  /** Exact AUC sufficient statistics for a score against a binary label:
    * one row (p, n, auc_num_x2) with AUC = auc_num_x2 / (2·p·n) — the
    * Mann–Whitney form Σ_pos (2·N_below + N_ties), all BIGINT, tie-aware.
    *
    * Scale shape: the corpus reduces FIRST by a score-keyed partial agg
    * to one row per DISTINCT score (cp, cn), and only that bounded frame
    * flows through the global cumulative window — the standard trick
    * that keeps an exact rank statistic off the "sort everything in one
    * partition" path. Scores here are whatever the caller bins to
    * (integer byte counts, fixed-point model outputs); for truly
    * continuous scores at 100 TB, quantize to fixed point first — AUC
    * over ties is exactly what the tie-aware numerator handles.
    */
  def aucExact(df: DataFrame, score: Column, label: Column): DataFrame = {
    // Rows with a null score are dropped up front: Spark windows default to
    // NULLS FIRST while the DuckDB oracle pattern is NULLS LAST, so a null
    // score would make the cumulative-negative counts engine-dependent.
    val g = df
      .select(score.as("__s"), when(label, 1L).otherwise(0L).as("__y"))
      .where(col("__s").isNotNull)
      .groupBy(col("__s"))
      .agg(sum(col("__y")).as("__cp"),
        sum(lit(1L) - col("__y")).as("__cn"))
    // Cumulative negatives strictly below each score: a window over the
    // DISTINCT-score frame (post-agg, cardinality-bounded).
    val w = Window.orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    g.select(col("__cp"), col("__cn"),
        coalesce(sum(col("__cn")).over(w), lit(0L)).as("__nb"))
      .agg(sum(col("__cp")).as("p"), sum(col("__cn")).as("n"),
        sum(col("__cp") * (lit(2L) * col("__nb") + col("__cn")))
          .as("auc_num_x2"))
  }
}
