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

  // NOTE on scan parallelism: the driver fixtures ship ONE parquet row
  // group per table, so a scan plans a single populated input partition
  // and all narrow work above it runs on one core. A blanket
  // rebalance-in-load was tried and REVERTED: it fixed the handful of
  // CPU-heavy queries but taxed all ~250 cheap ones with a pinned
  // 32-task exchange per table reference that AQE cannot coalesce
  // (measured: suite 324 -> 641 s, median per-query 2.0x). The fix
  // lives where the knowledge is — [[graft.ops.FanOut]] at the few
  // operator sites whose per-row work provably dominates one exchange
  // of their input.
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

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
