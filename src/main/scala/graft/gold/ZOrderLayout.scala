package graft.gold

import graft.expr.ZOrder
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-dimensional clustered layout via z-order (Morton) keys — the
  * data-skipping complement to [[PartitionedSink]]: partitioning prunes on
  * the partition column, z-ordering makes parquet min/max footers tight in
  * SEVERAL filter columns at once, so selective reads on any clustered
  * dimension skip most row groups. A plain `sortWithinPartitions(a)` gives
  * column `a` tight stats but leaves `b` spanning its full domain in every
  * file; interleaving the bits bounds BOTH spans per file (a range of z
  * values is a quad-tree block).
  *
  * Write shape: one range shuffle on the z key (`repartitionByRange`
  * samples boundaries, so files are balanced even under skew), one
  * in-partition sort, no extra pass. Dimensions are quantized to
  * `bitsPerDim` unsigned bits by the caller-supplied normalizers (default:
  * value as-is, for naturally bounded non-negative ints).
  */
object ZOrderLayout {

  /** Write `df` clustered by `z_order(dims)` into `numFiles` range-balanced
    * files. `dims` must be integral, non-negative, < 2^bitsPerDim (quantize
    * first otherwise).
    */
  def write(
      df: DataFrame,
      path: String,
      dims: Seq[String],
      bitsPerDim: Int,
      numFiles: Int): Unit =
    df.withColumn("__z", ZOrder.zOrder(dims.map(col), bitsPerDim))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
