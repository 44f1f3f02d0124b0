package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Date-partitioned silver layout (the concrete form of the "at 100 TB
  * these are date-partitioned table paths" contract in [[graft.Tables]]):
  * one directory per day, pruned by Catalyst when queries filter on the
  * partition column, files bounded so a single hot day cannot produce
  * multi-GB parquet files.
  *
  * Write discipline for scale:
  *  - `repartition(partitionCol)` before the write so each day's rows land
  *    in few tasks (otherwise every task opens a writer per day it sees —
  *    the small-files explosion);
  *  - `sortWithinPartitions(sortCols)` so parquet gets clustered values →
  *    tighter min/max row-group stats → better data skipping on read;
  *  - `maxRecordsPerFile` caps file size without a second shuffle.
  */
object PartitionedSink {

  /** Write `df` partitioned by the DATE of `tsCol` (a `__date` column is
    * derived and becomes the partition key).
    */
  def writeDaily(
      df: DataFrame,
      path: String,
      tsCol: String = "Timestamp",
      sortCols: Seq[String] = Nil,
      maxRecordsPerFile: Long = 5000000L): Unit = {
    val dated = df.withColumn("__date", to_date(col(tsCol)))
    val clustered = dated.repartition(col("__date"))
    (if (sortCols.nonEmpty)
      clustered.sortWithinPartitions(sortCols.map(col): _*)
    else clustered)
      .write
      .mode("overwrite")
      // DYNAMIC partition overwrite: replace only the __date partitions
      // this increment carries. The default STATIC mode truncates the
      // whole base path first — a daily-increment sink that deletes
      // every previous day on each write.
      .option("partitionOverwriteMode", "dynamic")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("__date")
      .parquet(path)
  }

  /** Read back with partition pruning available on `__date`. */
  def readDaily(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
