package graft.gold

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reader-side data skipping from a file-level min/max stats index — the
  * consumption half of what [[ZOrderLayout]]/[[PartitionedSink]] write:
  * given a clustered table, answer a selective range scan by reading ONLY
  * the files whose [min, max] envelope intersects the predicate. Parquet
  * row-group stats do this inside one file; this index does it across the
  * file LISTING, which is what matters when a 100 TB table is 100k files
  * and the driver would otherwise schedule tasks for every one of them.
  *
  * The index is built with one aggregation keyed by `input_file_name()` —
  * O(files) rows, cheap to persist next to the table and to rebuild after
  * compaction. Pruning is a driver-side filter over that small frame (the
  * same altitude as Delta/Iceberg file skipping — per-file metadata, not
  * data).
  */
object StatsIndex {

  /** One row per data file: (file, rows, and min_/max_ per key column). */
  def build(df: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val aggs = count(lit(1)).as("rows") +:
      keyCols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    df.withColumn("file", input_file_name())
      .groupBy("file")
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Files whose [min, max] envelope intersects [lo, hi] on `keyCol`.
    * All-NULL files (no min/max) cannot satisfy a range predicate and are
    * pruned too.
    */
  def candidateFiles(stats: DataFrame, keyCol: String,
      lo: Any, hi: Any): Seq[String] = {
    stats
      .filter(col(s"max_$keyCol") >= lit(lo) && col(s"min_$keyCol") <= lit(hi))
      .select("file").collect().map(_.getString(0)).toSeq
  }

  /** Range scan through the index: read only intersecting files, then
    * re-apply the exact predicate (stats admit false positives, never
    * false negatives). Returns the pruned frame plus (read, total) file
    * counts so callers — and specs — can see the skipping happen.
    */
  def prunedRangeScan(spark: SparkSession, stats: DataFrame, keyCol: String,
      lo: Any, hi: Any): (DataFrame, Int, Int) = {
    val allFiles = stats.select("file").collect().map(_.getString(0))
    require(allFiles.nonEmpty, "stats index is empty — no files to scan")
    val total = allFiles.length
    val files = candidateFiles(stats, keyCol, lo, hi)
    // Reading LEAF files directly loses Hive-style partition-column
    // inference (each file's parent becomes its own base), so a table
    // written by PartitionedSink would come back without __date — or the
    // filter below would fail to resolve it. basePath = the files'
    // common ancestor ABOVE any name=value partition directories
    // restores the inference.
    val base = StatsIndex.commonBase(allFiles)
    def read(fs: Seq[String]) =
      spark.read.option("basePath", base).parquet(fs: _*)
    val df =
      if (files.isEmpty)
        // Schema comes from one footer; lit(false) keeps every row out
        // without scanning row groups.
        read(Seq(allFiles.head)).filter(lit(false))
      else read(files)
    (df.filter(col(keyCol) >= lit(lo) && col(keyCol) <= lit(hi)),
      files.size, total)
  }

  /** Common ancestor directory of `files`, lifted above any trailing
    * Hive-style `name=value` segments so partition columns infer even
    * when every candidate sits in one partition directory.
    */
  private def commonBase(files: Seq[String]): String = {
    def parent(p: String) = p.substring(0, p.lastIndexOf('/'))
    var base = parent(files.head)
    while (!files.forall(f => f.startsWith(base + "/"))) base = parent(base)
    while (base.substring(base.lastIndexOf('/') + 1).contains("="))
      base = parent(base)
    base
  }
}
