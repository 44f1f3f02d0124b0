package graft.gold

import org.apache.spark.sql.{DataFrame, DataFrameWriter, Row, SparkSession}

/** Bucketed storage for co-located joins and shuffle-free aggregation
  * (SURVEY.md §4): writing a table bucketed by its join/group key means
  * every downstream `groupBy(key)` or join with an identically-bucketed
  * table reads data ALREADY hash-distributed — Catalyst drops the
  * Exchange entirely. At 100 TB this converts the silver→gold joins from
  * full-table shuffles into per-bucket local work; the shuffle is paid
  * ONCE, at write time, instead of per query.
  *
  * Plain parquet directories cannot carry bucket metadata, so bucketed
  * tables go through the session catalog (`saveAsTable`). Both sides of a
  * co-located join must agree on bucket column and count.
  */
object Bucketing {

  /** Write `df` as a bucketed (optionally sorted-within-bucket) parquet
    * table in the session catalog, replacing any previous version.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      numBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    val w: DataFrameWriter[Row] = df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** True when the physical plan contains no SHUFFLE — the assertion that
    * a bucketed layout is actually being exploited (plans regress
    * silently when bucket columns/counts drift). A BroadcastExchange is
    * not a shuffle and doesn't count against the layout.
    */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.linesIterator.exists(l =>
      l.contains("Exchange") && !l.contains("BroadcastExchange"))
}
