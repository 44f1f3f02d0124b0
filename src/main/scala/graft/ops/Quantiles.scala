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

  /** EXACT quantile_cont boundaries by distributed rank selection — the
    * shape that survives where a single `percentile` reducer cannot:
    * range-partition on the value (each tile sorts locally, in
    * parallel), turn per-tile counts into global base offsets, and fetch
    * ONLY the ≤ 2·|probs| order statistics the interpolation needs.
    * Nothing column-sized ever reaches one task; the collects are
    * #partitions rows and ≤ 2·|probs| rows.
    *
    * The interpolation `lo + (hi − lo)·(h − ⌊h⌋)` with h = (n−1)·p
    * reproduces Spark's `percentile` / DuckDB's `quantile_cont`
    * bitwise (same IEEE expression tree), so swapping this in under an
    * oracle-gated query changes the plan, not one bit of output.
    * Value ties straddling a tile boundary are harmless: selection only
    * reads the VALUE at a rank, identical under any tie order.
    */
  def exactQuantiles(df: DataFrame, xCol: String,
      probs: Seq[Double]): Seq[Double] = {
    import org.apache.spark.sql.expressions.Window
    val vals = df.select(col(xCol).cast("double").as("__x"))
      .filter(col("__x").isNotNull)
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = vals.repartitionByRange(parts, col("__x"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(eager = false) // counts pass + selection pass
    val sizes = ranged.groupBy("__pid").agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val n = sizes.map(_._2).sum
    if (n == 0) return probs.map(_ => Double.NaN)
    val hs = probs.map(p => (n - 1) * p)
    val ranks = hs.flatMap(h =>
      Seq(math.floor(h).toLong, math.ceil(h).toLong)).distinct.sorted
    // rank → (tile, 1-based local index) via exclusive tile offsets.
    val bases = sizes.scanLeft(0L)(_ + _._2).init
    val located = ranks.map { r =>
      val i = sizes.indices.findLast(i => bases(i) <= r).get
      (r, sizes(i)._1, r - bases(i) + 1)
    }
    val wanted = located.map { case (_, pid, rn) =>
      col("__pid") === pid && col("__rn") === rn
    }.reduce(_ || _)
    val w = Window.partitionBy("__pid").orderBy("__x")
    val picked = ranged.withColumn("__rn", row_number().over(w))
      .filter(wanted).select("__pid", "__rn", "__x")
      .collect().map(r => (r.getInt(0), r.getInt(1).toLong) -> r.getDouble(2))
      .toMap
    val byRank = located.map { case (r, pid, rn) => r -> picked((pid, rn)) }.toMap
    hs.map { h =>
      val lo = byRank(math.floor(h).toLong)
      val hi = byRank(math.ceil(h).toLong)
      lo + (hi - lo) * (h - math.floor(h))
    }
  }

  /** Adds `q_bucket` (0..probs.length): the number of `probs` quantile
    * boundaries strictly below the row's `xCol`.
    *
    * `exact = true` resolves the boundaries EAGERLY via
    * [[exactQuantiles]] (distributed rank selection — no single-reducer
    * percentile) and bands rows against literal boundaries in one
    * map-only projection. The approx path stays fully lazy: a mergeable
    * percentile_approx sketch pass, boundaries broadcast back.
    */
  def bucketize(df: DataFrame, xCol: String, probs: Seq[Double],
      exact: Boolean): DataFrame = {
    if (exact) {
      val qs = exactQuantiles(df, xCol, probs)
      val bucket = qs.foldLeft(lit(0)) { (acc, q) =>
        acc + (col(xCol) > lit(q)).cast("int")
      }
      df.withColumn("q_bucket", bucket)
    } else {
      val ps = array(probs.map(lit): _*)
      val bounds = df.agg(percentile_approx(col(xCol), ps, lit(10000)).as("__qs"))
      val bucket = probs.indices.foldLeft(lit(0)) { (acc, i) =>
        acc + (col(xCol) > col("__qs").getItem(i)).cast("int")
      }
      df.crossJoin(broadcast(bounds))
        .withColumn("q_bucket", bucket)
        .drop("__qs")
    }
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
