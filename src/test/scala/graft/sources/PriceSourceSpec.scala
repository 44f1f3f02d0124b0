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

  test("politeness delay spaces request starts per JVM") {
    val starts = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    PriceFetcher.register("delay_test", (_, _) => {
      starts.add(System.currentTimeMillis())
      Seq(PricePoint(1704067200L, Some(1L), None))
    })
    val df = spark.read.format("graft.sources.PriceSource")
      .option("items", "1,2,3,4").option("fetcher", "delay_test")
      .option("request_delay_ms", "120").load()
    assert(df.count() == 4)
    val ts = starts.toArray(Array.empty[java.lang.Long]).map(_.toLong).sorted
    val gaps = ts.sliding(2).map(a => a(1) - a(0)).toSeq
    // Scheduling jitter tolerance; the throttle guarantees the spacing of
    // GRANTED start times, the fetcher records actual call times.
    assert(gaps.forall(_ >= 100), s"request gaps $gaps under the 120ms delay")
  }

  test("404 lands the item empty and recorded; other items unaffected") {
    PriceFetchStats.clear()
    PriceFetcher.register("notfound_test", (id, _) =>
      if (id == "13") throw new PriceFetcher.ItemNotFound(id)
      else Seq(PricePoint(1704067200L, Some(7L), None)))
    val df = spark.read.format("graft.sources.PriceSource")
      .option("items", "12,13,14").option("fetcher", "notfound_test").load()
    val byItem = df.groupBy("item_id").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byItem == Map("12" -> 1L, "14" -> 1L))
    assert(PriceFetchStats.snapshot.exists(_._1 == "13"))
  }

  test("404 in strict mode fails the task — completeness was requested") {
    PriceFetcher.register("notfound_strict", (id, _) =>
      throw new PriceFetcher.ItemNotFound(id))
    val strict = spark.read.format("graft.sources.PriceSource")
      .option("items", "13").option("fetcher", "notfound_strict")
      .option("tolerate_failures", "false").load()
    val e = intercept[org.apache.spark.SparkException] { strict.count() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("not found")), e.getMessage)
  }

  test("transient failures retry with backoff, then succeed") {
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    PriceFetcher.register("flaky_test", (_, _) => {
      if (attempts.incrementAndGet() <= 2)
        throw new java.io.IOException("connection reset")
      Seq(PricePoint(1704067200L, Some(9L), None))
    })
    val df = spark.read.format("graft.sources.PriceSource")
      .option("items", "77").option("fetcher", "flaky_test")
      .option("max_retries", "3").option("retry_backoff_ms", "10").load()
    assert(df.count() == 1)
    assert(attempts.get() == 3) // two failures + the success
  }

  test("exhausted retries: tolerated -> empty + recorded, strict -> task failure") {
    PriceFetchStats.clear()
    PriceFetcher.register("dead_test",
      (_, _) => throw new java.io.IOException("always down"))
    val tolerated = spark.read.format("graft.sources.PriceSource")
      .option("items", "88").option("fetcher", "dead_test")
      .option("max_retries", "1").option("retry_backoff_ms", "5").load()
    assert(tolerated.count() == 0)
    assert(PriceFetchStats.snapshot.exists { case (id, why) =>
      id == "88" && why.contains("always down") })
    val strict = spark.read.format("graft.sources.PriceSource")
      .option("items", "88").option("fetcher", "dead_test")
      .option("max_retries", "1").option("retry_backoff_ms", "5")
      .option("tolerate_failures", "false").load()
    val e = intercept[org.apache.spark.SparkException] { strict.count() }
    assert(e.getMessage.contains("always down") ||
      Option(e.getCause).exists(_.getMessage.contains("always down")))
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

  test("a missing items option fails with a pointed message, not an NPE") {
    val e = intercept[IllegalArgumentException] {
      spark.read.format("graft.sources.PriceSource")
        .option("fetcher", "test")
        .load().count()
    }
    assert(e.getMessage.contains("items"), e.getMessage)
  }
}
