package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) builder: collapse a change log into
  * validity intervals — the temporal-dimension shape behind the reference's
  * username remap (SURVEY §2.3 J5) generalized to arbitrary tracked
  * attributes, and the standard way a training-data pipeline versions
  * entity metadata (license, domain labels, crawl policy) so facts can be
  * joined AS OF their event time (see [[AsOfJoin]]).
  *
  * Consecutive rows (per key, in (ts, tieBreak) order) with identical
  * tracked attributes merge into one segment; each segment's `valid_from`
  * is its first change's timestamp and `valid_to` the next segment's
  * `valid_from` (half-open [from, to); null `valid_to` = current).
  *
  * Shape: one hash shuffle on the key feeds every window and the segment
  * groupBy (same partitioning reused); attribute comparison is null-safe
  * (`<=>`), so null→value and value→null transitions open segments. The
  * per-segment attribute values are taken with `min_by` on the full
  * (ts, tieBreak) order key — deterministic under re-runs and partition
  * reshuffles, never `first()`.
  */
object Scd2 {

  /** @param keys     entity key columns
    * @param attrs    tracked attribute columns (a change in ANY opens a segment)
    * @param tsCol    change timestamp
    * @param tieBreak extra order columns making (ts, tieBreak) unique per key
    */
  def fromChangeLog(
      log: DataFrame,
      keys: Seq[String],
      attrs: Seq[String],
      tsCol: String,
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty && attrs.nonEmpty, "keys and attrs must be non-empty")
    val ordCols: Seq[Column] = (col(tsCol) +: tieBreak.map(col)).map(_.asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordCols: _*)
    val wRows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val attrChanged = attrs.map(a => !(col(a) <=> lag(col(a), 1).over(w))).reduce(_ || _)
    val chg = when(row_number().over(w) === 1, 1)
      .otherwise(when(attrChanged, 1).otherwise(0))

    val orderKey = struct(col(tsCol) +: tieBreak.map(col): _*)
    val aggs = min(col(tsCol)).as("valid_from") +:
      attrs.map(a => min_by(col(a), orderKey).as(a))
    val segments = log
      .withColumn("__chg", chg)
      .withColumn("__seg", sum(col("__chg")).over(wRows))
      .groupBy(keys.map(col) :+ col("__seg"): _*)
      .agg(aggs.head, aggs.tail: _*)

    // __seg is monotone in (ts, tieBreak) per key, so ordering by it alone
    // sequences segments even when adjacent segments share a timestamp.
    val wSeg = Window.partitionBy(keys.map(col): _*).orderBy(col("__seg").asc)
    segments
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wSeg))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__seg")
      .select((keys ++ attrs ++ Seq("valid_from", "valid_to", "is_current")).map(col): _*)
  }
}
