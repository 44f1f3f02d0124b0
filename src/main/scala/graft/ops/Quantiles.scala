package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quantile bucketing: label every row with the quantile band of a
  * numeric column (quartiles, deciles, …).
  *
  * Never `ntile` — a global ntile needs a total order, which drags the
  * whole table through one partition's sort. Instead: boundaries come
  * from ONE aggregate pass, are broadcast (a handful of doubles), and a
  * map-only projection bands each row — the same two-pass
  * stats-then-scan shape as the histogram and z-score operators.
  *
  * `exact = true` uses Spark's exact `percentile` (per-group sort —
  * fine for oracle baselines and medium data); the 100 TB path is
  * `exact = false` → `percentile_approx` (mergeable t-digest-style
  * sketch, one partial-agg'd pass, bounded error on the *boundaries*
  * only — rows near a boundary may swap bands, everything else is
  * identical).
  */
object Quantiles {

  /** Adds `q_bucket` (0..probs.length): the number of `probs` quantile
    * boundaries strictly below the row's `xCol`.
    */
  def bucketize(df: DataFrame, xCol: String, probs: Seq[Double],
      exact: Boolean): DataFrame = {
    val ps = array(probs.map(lit): _*)
    val boundsAgg: Column =
      if (exact) percentile(col(xCol), ps)
      else percentile_approx(col(xCol), ps, lit(10000))
    val bounds = df.agg(boundsAgg.as("__qs"))
    val bucket = probs.indices.foldLeft(lit(0)) { (acc, i) =>
      acc + (col(xCol) > col("__qs").getItem(i)).cast("int")
    }
    df.crossJoin(broadcast(bounds))
      .withColumn("q_bucket", bucket)
      .drop("__qs")
  }

  /** Per-group variant — "which quartile of ITS CATEGORY is this row in":
    * boundaries per `groupCols` from one aggregate pass, broadcast-joined
    * back (the boundary table is #groups rows), then the same map-only
    * banding. The fact table still never sorts globally or per group.
    *
    * Contract: rows with a NULL group key are DROPPED (the boundary join
    * is null-unsafe — a quantile of an undefined category is undefined);
    * filter or fill group keys upstream if every row must survive.
    * [[bucketize]] (the global variant) keeps all rows.
    */
  def bucketizeByGroup(df: DataFrame, xCol: String, groupCols: Seq[String],
      probs: Seq[Double], exact: Boolean): DataFrame = {
    val ps = array(probs.map(lit): _*)
    val boundsAgg: Column =
      if (exact) percentile(col(xCol), ps)
      else percentile_approx(col(xCol), ps, lit(10000))
    val bounds = df.groupBy(groupCols.map(col): _*).agg(boundsAgg.as("__qs"))
    val bucket = probs.indices.foldLeft(lit(0)) { (acc, i) =>
      acc + (col(xCol) > col("__qs").getItem(i)).cast("int")
    }
    df.join(broadcast(bounds), groupCols)
      .withColumn("q_bucket", bucket)
      .drop("__qs")
  }
}
