package graft.streaming

import graft.ops.Hll
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** Continuous distinct-count monitoring: a per-group HyperLogLog sketch
  * maintained across micro-batches — "unique users per source, live,
  * forever" without ever storing the item universe.
  *
  * The state IS a [[StreamingGold]] table keyed (groupCols..., reg) with
  * `rho` as the version column: StreamingGold's last-write-wins merge
  * takes max(rho) per key, and HLL union IS per-register max — so the
  * generic keyed-upsert sink double-functions as the sketch combiner,
  * inheriting its exactly-once contract wholesale (batch-id log +
  * blue/green swap; and since max-merge is idempotent AND commutative,
  * even an out-of-band double application converges).
  *
  * Per batch the stream contributes only its register DELTA
  * ([[Hll.registers]] — map-side-combined, ≤ m rows per group), so state
  * size is groups × 256 rows regardless of stream volume, and the
  * estimate over the accumulated table is BIT-IDENTICAL to a batch
  * [[Hll]] sketch over the concatenation of every batch ever seen (max
  * is associative/commutative — the spec pins this invariant across a
  * stop/resume).
  */
class StreamingDistinct(
    rootDir: String,
    itemCol: String,
    groupCols: Seq[String]) {

  /** Register store: key = (groups, reg), version = rho → max-merge. */
  val store = new StreamingGold(rootDir, keys = groupCols :+ "reg",
    versionCol = "rho")

  /** Merge one micro-batch's register delta. Public for backfill. */
  def mergeBatch(batch: DataFrame, batchId: Long): Unit =
    store.mergeBatch(Hll.registers(batch, itemCol, groupCols), batchId)

  /** Live per-group estimates, once any batch has committed. */
  def estimates(spark: SparkSession): Option[DataFrame] =
    store.read(spark).map(Hll.estimateBy(_, groupCols))

  /** The raw live register table (for merging with OTHER sketch stores —
    * union + max, as in [[Hll.merge]]).
    */
  def registers(spark: SparkSession): Option[DataFrame] = store.read(spark)

  def writer(stream: DataFrame, checkpointDir: String,
      trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[Row] =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (b: Dataset[Row], id: Long) => mergeBatch(b.toDF(), id) }
}
