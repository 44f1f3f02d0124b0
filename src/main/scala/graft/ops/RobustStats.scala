package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-group location estimates — trimmed and winsorized means.
  *
  * The mean/stddev and median/MAD flaggers (q_outliers, q_mad_outliers)
  * DETECT contaminated values; these estimators SUMMARIZE a metric so a
  * few wild rows cannot move the headline number — the standard treatment
  * for latency/price/engagement dashboards where a handful of bot or
  * glitch rows would otherwise own the mean. Both estimators derive from
  * one exact per-group ranking:
  *
  *  - trimmed mean: drop the k = floor(trim·n) smallest and k largest
  *    values, average the rest;
  *  - winsorized mean: CLAMP those 2k values to the surviving extremes
  *    (ranks k+1 and n−k) instead of dropping them — same breakdown
  *    point, but n stays the denominator so groups keep their weight.
  *
  * Determinism: NULL values are excluded up front (n, k, ranks, and
  * sums all derive from the non-null set — engines disagree on where
  * nulls sort, so letting one consume a rank would shift the cut per
  * engine); ranks then order by (value, tie-break columns) — a total
  * order, so ties at the trim boundary cut identically on any engine or
  * partitioning. Sums stay in the caller's value type (pass a DECIMAL
  * column for exact, order-independent accumulation; the means divide
  * once, at the end, in float64).
  *
  * Scale shape: ONE group-keyed shuffle feeds both windows (the
  * whole-partition count and the rank share their exchange), per-group
  * sort — spillable, the [[Quantiles.groupBoundsExact]] contract:
  * parallelism is bounded by the number of groups, so this fits
  * many-medium-groups shapes; for a FEW-huge-groups shape route the cut
  * points through the tiled [[Quantiles]] machinery instead — then one
  * partial-agg'd readout. The clamp values come out of the same final
  * aggregate (max over the boundary-rank rows) — no second pass over the
  * data, and NULL group keys survive as their own group (window
  * partitioning is null-safe where a count-join-back would drop them).
  */
object RobustStats {

  /** Per-group (n_rows, trim_k, lo/hi clamps, trimmed_mean, winsor_mean).
    *
    * @param tieCols  columns completing a TOTAL order within (group,
    *                 value) — required so boundary ties cut reproducibly
    * @param trim     fraction trimmed from EACH end, in [0, 0.5); k =
    *                 floor(trim·n) per group, so n − 2k ≥ 1 always holds
    */
  def trimmedStats(
      df: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      tieCols: Seq[String],
      trim: Double): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    require(trim >= 0.0 && trim < 0.5,
      s"trim must be in [0, 0.5) (0.5 would empty even groups), got $trim")
    val g = groupCols.map(col)
    // Group size via a whole-partition window, NOT a groupBy + join-back:
    // it shares the rank window's exchange (one shuffle, no broadcast
    // hop), and window partitioning is null-safe where a join-back would
    // silently drop rows whose group key is NULL.
    val pw = Window.partitionBy(g: _*)
    val w = pw.orderBy((col("__v") +: tieCols.map(col)): _*)
    val ranked = df
      .select((g :+ col(valueCol).as("__v")) ++ tieCols.map(col): _*)
      // NULL values are excluded BEFORE counting/ranking: a null cannot
      // be averaged, and letting it consume a rank would both shift the
      // trim cut and (worse) depend on the engine's null sort order
      // (Spark nulls-first vs DuckDB nulls-last) — the estimators are
      // over the non-null values, with n/k derived from the same set.
      .filter(col("__v").isNotNull)
      .withColumn("__n", count(lit(1)).over(pw))
      .withColumn("__k", floor(lit(trim) * col("__n")).cast("long"))
      .withColumn("__rk", row_number().over(w).cast("long"))
    val kept = col("__rk") > col("__k") &&
      col("__rk") <= col("__n") - col("__k")
    ranked
      .groupBy(g: _*)
      .agg(
        max(col("__n")).as("n_rows"),
        max(col("__k")).as("trim_k"),
        sum(when(kept, col("__v"))).as("__tsum"),
        // Boundary-rank rows are unique (row_number), so max() just
        // plucks them; they double as the winsorization clamps.
        max(when(col("__rk") === col("__k") + 1, col("__v"))).as("lo_clamp"),
        max(when(col("__rk") === col("__n") - col("__k"), col("__v")))
          .as("hi_clamp"))
      .withColumn("trimmed_mean",
        col("__tsum").cast("double") /
          (col("n_rows") - lit(2L) * col("trim_k")).cast("double"))
      .withColumn("winsor_mean",
        (col("__tsum") + col("trim_k") * col("lo_clamp") +
          col("trim_k") * col("hi_clamp")).cast("double") /
          col("n_rows").cast("double"))
      .drop("__tsum")
  }
}
