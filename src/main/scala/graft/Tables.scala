package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet fixtures (TESTDATA.md).
  *
  * Every query in [[SparkEntry.queries]] reads exclusively through here so
  * that scans stay uniform: parquet source, column pruning + predicate
  * pushdown via Catalyst (verify with `.explain`: `PushedFilters`,
  * `ReadSchema`). At 100 TB these would be date-partitioned table paths;
  * the call-site API is identical.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Scale-adaptive scan rebalance (guide §2.5 "input skew", §2.6 idle
    * capacity): the driver fixtures ship ONE parquet row group per
    * table, so a scan plans a single populated input partition and all
    * NARROW work above it — text explodes, vector arithmetic, map-side
    * partial aggregation — runs on one core no matter how many the
    * session has (measured: q_ccnet_buckets spent 2.3 s of its 4.2 s in
    * single-task stages; ~35 queries clustered at 8-core ≈ 32-core in
    * the r17 scaling block for this reason). One bounded round-robin
    * exchange of the input right after the read unlocks every core.
    *
    * Both guards derive from the input, not from a local-mode constant:
    *   - identity when the scan already plans >= defaultParallelism
    *     input splits — at production scale (many files / 128 MB row
    *     groups) that is always true, so NO exchange is added there;
    *   - identity for broadcast-dimension-sized files (< 256 KB —
    *     region/nation/supplier): parallelizing a dim scan pays a
    *     shuffle stage on every broadcast-build path for work a single
    *     task finishes in milliseconds.
    * Filter/column pruning still reach the scan (Catalyst pushes
    * deterministic predicates below Repartition), so PushedFilters /
    * ReadSchema are unchanged; the exchange carries only the pruned
    * columns.
    */
  private def rebalance(spark: SparkSession, path: String,
      df: DataFrame): DataFrame = {
    val target = spark.sparkContext.defaultParallelism.toLong
    val p = new org.apache.hadoop.fs.Path(path)
    val bytes = try {
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.getContentSummary(p).getLength
    } catch { case _: Exception => 0L }
    // Pure byte arithmetic — no .rdd/planning probe (measured: forcing a
    // QueryExecution per load call taxed every cheap query). A table
    // whose bytes cannot fill `target` max-sized splits cannot reach
    // `target` scan tasks; above that the scan parallelizes itself and
    // this is the identity.
    val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
    if (bytes > 256 * 1024 && bytes < target * maxSplit)
      df.repartition(target.toInt)
    else df
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    rebalance(spark, path, spark.read.parquet(path))
  }

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  /** `events.parquet` has shipped with two physical types for `ts` across
    * fixture generations: INT64 TIMESTAMP(NANOS) — which Spark's µs
    * TimestampType cannot represent, so it is read as raw LONG nanos under
    * the legacy flag and floored to µs (integer `div`; ns epochs exceed
    * 2^53, so no double round-trip) — and plain TIMESTAMP(MICROS), which
    * Spark reads as TIMESTAMP_NTZ. Normalize both to session-TZ (UTC)
    * TimestampType so every downstream query sees one type.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(spark, sfDir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
