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
    * Scale shape, two layers:
    *   1. the corpus reduces FIRST by a score-keyed partial agg to one
    *      row per DISTINCT score (cp, cn) — map-side combine, so the
    *      shuffle carries score cardinality, not row count;
    *   2. the cumulative-negatives-below rank statistic over that frame
    *      is a RANGE-TILED prefix sum (the [[graft.ops.SeqPack]] shape):
    *      range-partition on score, a per-tile local window, tile totals
    *      folded into broadcast base offsets. No single-partition sort
    *      anywhere — a CONTINUOUS score column (|distinct| ≈ n) costs
    *      the same two narrow passes as an integer one.
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
    // Range-tile the distinct-score frame: tile-local exclusive cumsum of
    // negatives, then per-tile totals → exclusive base offsets (the
    // triangle join is #partitions², broadcast-sized by construction).
    // Range partition ids are ordered by key, so pid order IS score order.
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = g.repartitionByRange(parts, col("__s"))
      .withColumn("__pid", spark_partition_id())
    val wLocal = Window.partitionBy("__pid").orderBy("__s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = ranged
      .withColumn("__lnb", coalesce(sum(col("__cn")).over(wLocal), lit(0L)))
    val sizes = local.groupBy("__pid").agg(sum(col("__cn")).as("__cnt"))
    val offsets = sizes.alias("a")
      .join(sizes.alias("b"), col("b.__pid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(coalesce(sum(col("b.__cnt")), lit(0L)).as("__base"))
    local.join(broadcast(offsets), "__pid")
      .select(col("__cp"), col("__cn"),
        (col("__base") + col("__lnb")).as("__nb"))
      .agg(sum(col("__cp")).as("p"), sum(col("__cn")).as("n"),
        sum(col("__cp") * (lit(2L) * col("__nb") + col("__cn")))
          .as("auc_num_x2"))
  }
}
