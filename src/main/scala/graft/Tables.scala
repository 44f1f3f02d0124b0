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

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")
  /** `events.parquet` stores `ts` as INT64 TIMESTAMP(NANOS) which Spark's
    * TimestampType (µs) cannot represent — Spark 4 refuses the file outright
    * (PARQUET_TYPE_ILLEGAL). Read the raw nanos as LONG and floor to µs
    * (integer `div`, no double round-trip: ns epochs exceed 2^53). Whole-
    * second boundary predicates are unaffected by the floor.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(spark, sfDir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")
}
