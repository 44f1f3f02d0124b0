package graft.ops

import org.apache.spark.sql.DataFrame

/** Round-robin fan-out for a frame about to enter CPU-heavy NARROW work
  * (guide §2.5 "input skew": one huge unsplittable input → repartition
  * right after the read).
  *
  * The driver fixtures ship one parquet row group per table, so a scan
  * plans a single populated partition and everything narrow above it —
  * shingle explodes, O(|block|²) pair scoring, long-regex extraction —
  * runs on ONE core regardless of the session's width. One exchange of
  * the input unlocks every core.
  *
  * This is deliberately an OPERATOR-SITE decision, not a load-time one:
  * a blanket rebalance in Tables.load was measured to double the suite
  * (a pinned repartition defeats AQE partition coalescing, so every
  * cheap query paid a 32-task micro-stage per table reference). Callers
  * assert their downstream per-row work dominates one exchange of the
  * input — true for the sites below at ANY scale, because the same
  * ratio (work per row ≫ shuffle cost per row) holds when both grow.
  *
  * Identity when the input already plans >= defaultParallelism
  * partitions (the production case — many files / row groups), so no
  * exchange is added at scale; the `.rdd` partition probe costs one
  * physical-plan construction, acceptable at a handful of call sites.
  */
object FanOut {

  def apply(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
