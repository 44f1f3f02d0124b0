package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global dense ordinals (0-based `row_number` in a total order) WITHOUT
  * the single-partition window — the "assign stable integer ids" step
  * behind tokenizer vocabularies, node-id compaction for graph
  * algorithms, and embedding-table row assignment.
  *
  * `Window.orderBy(...)` with no partition key serializes the entire
  * table through one task; this shape never does. Instead:
  * range-partition on the order key (sampled boundaries, so skew still
  * balances), take per-partition local row_numbers, then add each
  * partition's base offset — a per-partition count aggregate (#partitions
  * rows) turned into a running offset and broadcast back. Two narrow
  * passes, no global sort, bit-identical to the global window because
  * range partitions tile the total order.
  *
  * The order must be TOTAL: `orderCols` needs a unique tiebreaker
  * (duplicate keys straddling a range boundary would otherwise make the
  * tiling ambiguous).
  */
object Ordinals {

  /** Append `ordinal` (0-based position in `orderCols` order). */
  def assign(df: DataFrame, orderCols: Seq[Column],
      partitions: Int = 0): DataFrame = {
    require(orderCols.nonEmpty)
    val n = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // localCheckpoint BEFORE fanning out: `local` feeds both the size
    // aggregate and the final join, and without lineage truncation each
    // consumer re-instantiates the repartitionByRange subtree — whose
    // boundary SAMPLING can differ between instantiations (the round-10
    // partition-id-tiling failure: __pid keys disagree across branches
    // and the broadcast offsets mis-key, silently shifting ordinals).
    // Truncating makes the sampled layout physical: every branch reads
    // the same materialized blocks, so __pid is computed exactly once.
    // Lifecycle: the pin is input-sized and lives until the GC-driven
    // ContextCleaner — it CANNOT be released here because the returned
    // lazy frame reads it, and truncated lineage cannot recompute. A
    // long-lived session hammering assign() should action the result
    // and Checkpoints.release the blocks itself, or cycle the session
    // (the bench clears blocks between queries for exactly this).
    val ranged = df.repartitionByRange(n, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(false)
    val wLocal = Window.partitionBy("__pid").orderBy(orderCols: _*)
    val local = ranged.withColumn("__rn", row_number().over(wLocal))
    // Partition sizes → exclusive prefix offsets. #partitions rows: the
    // triangle-join running sum is broadcast-sized by construction.
    val sizes = local.groupBy("__pid").agg(count(lit(1)).as("__cnt"))
    val offsets = sizes.alias("a")
      .join(sizes.alias("b"), col("b.__pid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(coalesce(sum(col("b.__cnt")), lit(0L)).as("__off"))
    local.join(broadcast(offsets), "__pid")
      .withColumn("ordinal", col("__off") + col("__rn") - 1)
      .drop("__pid", "__rn", "__off")
  }
}
