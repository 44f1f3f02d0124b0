package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group ordinary-least-squares trend lines in closed form — the
  * "is this metric drifting" primitive (daily volume trend per event
  * type, quality-score drift per source) computed as ONE partial-agg'd
  * pass, no ML library, no iteration.
  *
  * Numerical contract: x and y enter as INTEGERS (y pre-scaled to cents
  * by the caller-supplied scale), all five sufficient statistics
  * (n, Σx, Σy, Σxy, Σx²) are exact integer sums, and floating point
  * appears in exactly TWO divisions at the end — so results are
  * bit-identical on any engine/partitioning given the same rounding.
  * Callers keep x SMALL (days since the dataset epoch, not raw epoch
  * days) so n·Σx² stays far from the 2^63 cliff.
  *
  * Scale: a single groupBy with five algebraic aggregates — map-side
  * combine, one shuffle of five longs per group. This is the canonical
  * "sufficient statistics, not data movement" formulation.
  */
object Regression {

  /** (groupCols…, n, slope, intercept) — slope/intercept in y-units per
    * x-unit, from `y = intercept + slope·x` least squares. Groups with
    * zero x-variance emit NULL slope/intercept (vertical line).
    *
    * @param yScale y is quantized to `round(y·yScale)` integers before
    *               summing (100 = cents); outputs are rescaled back
    */
  def groupTrend(df: DataFrame, groupCols: Seq[String], xCol: String,
      yCol: String, yScale: Long = 100L): DataFrame = {
    require(groupCols.nonEmpty)
    val x = col(xCol).cast("long")
    val yq = round(col(yCol).cast("double") * yScale).cast("long")
    val agg = df
      .select(groupCols.map(col) :+ x.as("__x") :+ yq.as("__y"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"), sum(col("__x")).as("__sx"),
        sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"))
    val den = (col("__n") * col("__sxx") - col("__sx") * col("__sx"))
    val slopeScaled = // in quantized-y units per x unit
      (col("__n") * col("__sxy") - col("__sx") * col("__sy")).cast("double") /
        den.cast("double")
    val slope = slopeScaled / lit(yScale.toDouble)
    val intercept =
      (col("__sy").cast("double") / lit(yScale.toDouble) -
        slope * col("__sx").cast("double")) / col("__n").cast("double")
    agg.select(groupCols.map(col) :+ col("__n").as("n") :+
      when(den =!= 0, slope).as("slope") :+
      when(den =!= 0, intercept).as("intercept"): _*)
  }
}
