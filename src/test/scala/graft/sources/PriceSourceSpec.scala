package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PriceSourceSpec extends AnyFunSuite with SparkTestBase {

  test("V2 source fans out one partition per item and lands typed rows") {
    PriceFetcher.register("test", (itemId, timestep) => {
      val base = itemId.toLong * 1000
      (0 until 3).map(i =>
        PricePoint(1704067200L + i * timestep, Some(base + i), Some(base + i - 10)))
    })

    val df = spark.read.format("graft.sources.PriceSource")
      .option("items", "2, 6, 30")
      .option("fetcher", "test")
      .option("timestep", "86400")
      .load()

    assert(df.schema.fieldNames.toSeq ==
      Seq("item_id", "ts", "avg_high_price", "avg_low_price"))
    assert(df.rdd.getNumPartitions == 3) // one partition per item
    assert(df.count() == 9)

    val got = df.filter(col("item_id") === "6").orderBy("ts").collect()
    assert(got.head.getTimestamp(1).toString.startsWith("2024-01-01"))
    assert(got.map(_.getLong(2)).toSeq == Seq(6000L, 6001L, 6002L))
  }

  test("fetched frame feeds the as-of enrichment path") {
    PriceFetcher.register("test2", (_, _) =>
      Seq(PricePoint(1704067200L, Some(42L), None)))
    val prices = spark.read.format("graft.sources.PriceSource")
      .option("items", "20997").option("fetcher", "test2").load()
      .withColumnRenamed("ts", "timestamp")
    // Same shape Enrichment.applyValueOverrides expects.
    assert(prices.select("item_id", "timestamp", "avg_high_price").count() == 1)
  }
}
