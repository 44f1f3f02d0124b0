package graft.streaming

import java.sql.Timestamp

import graft.SparkTestBase
import graft.ops.AsOfJoin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-static as-of enrichment: each micro-batch of the fact stream
  * as-of-probes a STATIC dimension-sized time series (the price-lookup
  * shape, SURVEY §2.3 J4 in its streaming setting). Driven through
  * `foreachBatch` + the native as-of plan — at test scale the build side
  * is under the broadcast threshold, so every batch plans the
  * [[graft.plans.BroadcastAsOfJoinExec]] map-only path: the stream is
  * never shuffled for the enrichment.
  */
class StreamingAsOfSpec extends AnyFunSuite with SparkTestBase {

  private def t(s: String) = Timestamp.valueOf(s)

  test("micro-batches enrich against the static series; broadcast plan per batch") {
    import spark.implicits._
    val prices = Seq(
      ("whip", t("2024-01-01 00:00:00"), 100L),
      ("whip", t("2024-01-02 00:00:00"), 120L),
      ("bow", t("2024-01-01 12:00:00"), 50L))
      .toDF("item", "price_ts", "price")

    val mem = MemoryStream[(Long, String, Timestamp)](spark)
    val facts = mem.toDF().toDF("event_id", "item", "ts")

    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Any)]
    val plans = scala.collection.mutable.ArrayBuffer.empty[String]
    val q = facts.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val enriched = AsOfJoin.joinNative(batch, prices,
          Seq("item"), "ts", "price_ts", Seq("price"))
        plans += enriched.queryExecution.executedPlan.toString
        enriched.collect().foreach(r => results += (r.getLong(0) -> r.get(3)))
        ()
      }
      .start()
    try {
      mem.addData((1L, "whip", t("2024-01-01 06:00:00")),
        (2L, "bow", t("2024-01-01 06:00:00"))) // bow before first price
      q.processAllAvailable()
      mem.addData((3L, "whip", t("2024-01-03 00:00:00")),
        (4L, "dagger", t("2024-01-03 00:00:00"))) // item with no series
      q.processAllAvailable()
    } finally q.stop()

    assert(results.toMap === Map(
      1L -> 100L, // backward to the Jan-1 price
      2L -> 50L,  // no backward price yet: forward fallback
      3L -> 120L, // latest price
      4L -> null))
    assert(plans.nonEmpty)
    assert(plans.forall(_.contains("BroadcastAsOfJoin")),
      s"expected the map-only broadcast plan per batch:\n${plans.head}")
    assert(plans.forall(!_.contains("Exchange hashpartitioning")),
      "the fact stream must not shuffle for the enrichment")
  }
}
