package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gorilla timestamp compression profile (Pelkonen et al., VLDB'15
  * §4.1.1): time-series timestamps compress by storing the
  * delta-of-delta — regular cadences make it 0 (one bit) and jitter
  * lands in small variable-width classes. This op computes, per series,
  * the exact dod distribution over Gorilla's bit classes and the
  * resulting compressed size — the storage-planning signal (expected
  * bytes/point) an ingest layer uses to pick encodings BEFORE writing a
  * 100 TB table.
  *
  * Class widths follow the paper (header + value bits): dod = 0 → 1;
  * [−63, 64] → 9; [−255, 256] → 12; [−2047, 2048] → 16; else 37.
  *
  * Shape: one series-keyed window (two lags), then a partial-agg'd
  * groupBy — the window partitions by series, so no global sort. Integer
  * arithmetic throughout; the single ratio division happens last.
  */
object DeltaOfDelta {

  private def bitsFor(dod: Column): Column =
    when(dod === 0L, 1L)
      .when(dod >= -63L && dod <= 64L, 9L)
      .when(dod >= -255L && dod <= 256L, 12L)
      .when(dod >= -2047L && dod <= 2048L, 16L)
      .otherwise(37L)

  /** Per-series dod profile from an integer time column: counts per bit
    * class, total payload bits, and the compression ratio vs raw 64-bit
    * stamps. Series need ≥3 points for a dod; shorter series report
    * zero counts and a null ratio.
    */
  def profile(df: DataFrame, seriesCol: String, timeCol: String,
      tieCols: String*): DataFrame = {
    // tieCols make the lag order total when the (floored) time column
    // collides — required for deterministic output.
    val w = Window.partitionBy(col(seriesCol))
      .orderBy(col(timeCol) +: tieCols.map(col): _*)
    val delta = col(timeCol) - lag(col(timeCol), 1).over(w)
    val withDod = df
      .withColumn("__d", delta)
      .withColumn("__dod", col("__d") - lag(col("__d"), 1).over(w))
    val cls = bitsFor(col("__dod"))
    def cnt(bits: Long): Column =
      sum(when(col("__dod").isNotNull && cls === bits, 1L).otherwise(0L))
    withDod.groupBy(col(seriesCol))
      .agg(
        count(lit(1)).as("n_points"),
        cnt(1L).as("c1"), cnt(9L).as("c9"), cnt(12L).as("c12"),
        cnt(16L).as("c16"), cnt(37L).as("c37"),
        sum(when(col("__dod").isNotNull, bitsFor(col("__dod")))
          .otherwise(0L)).as("payload_bits"))
      .withColumn("n_dod",
        col("c1") + col("c9") + col("c12") + col("c16") + col("c37"))
      .withColumn("ratio",
        when(col("n_dod") > 0,
          round(col("payload_bits").cast("double") / (col("n_dod") * 64L), 4)))
  }
}
