package graft.gold

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-evolution-aware reads: a long-lived table accumulates files
  * written under several schema versions (columns added over time); the
  * reader must present the UNION schema with older files null-backfilled
  * — silently picking one file's footer (Spark's default) drops the new
  * columns for whole partitions depending on scan order.
  *
  * `readMerged` is the contract wrapper: mergeSchema on, plus an optional
  * REQUIRED-column check so a typo'd rename fails the read instead of
  * materializing a 100% null column downstream. Additive evolution only —
  * type CHANGES (int→long) are rejected by parquet merging itself, which
  * is the correct failure: rewrite, don't reinterpret.
  */
object Evolution {

  def readMerged(spark: SparkSession, path: String,
      required: Seq[String] = Nil): DataFrame = {
    val df = spark.read.option("mergeSchema", "true").parquet(path)
    val missing = required.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"merged schema is missing required columns: ${missing.mkString(", ")}")
    df
  }

  /** Null-rate report per column — the data-quality probe run after a
    * schema migration ("how much of the table predates column X").
    */
  def nullRates(df: DataFrame): DataFrame = {
    val n = count(lit(1))
    val aggs = df.columns.toSeq.map(c =>
      (sum(when(col(c).isNull, 1L).otherwise(0L)) / n).as(c))
    df.agg(aggs.head, aggs.tail: _*)
      .select(df.columns.toSeq.map(c =>
        round(col(c), 4).as(s"null_rate_$c")): _*)
  }
}
