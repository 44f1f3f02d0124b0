package graft.streaming

import graft.SparkTestBase
import graft.ops.AsOfJoin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Each micro-batch must be enriched exactly like the batch as-of join
  * would enrich it, and a build-side refresh BETWEEN batches must be
  * visible at the next trigger without restarting the query.
  */
class StreamingAsOfEnrichSpec extends AnyFunSuite with SparkTestBase {

  test("micro-batches enrich through the native as-of; refreshes apply per trigger") {
    import spark.implicits._
    // Mutable "gold price table": the provider re-reads it per batch.
    @volatile var series = Seq(("itemA", 10, 100L), ("itemB", 5, 50L))
    def buildDf = series.toDF("item", "pt", "price")

    val mem = MemoryStream[(Long, String, Int)](spark)
    val events = mem.toDF().toDF("event_id", "item", "t")
    val got = scala.collection.mutable.Map.empty[Long, (Long, Any)]
    val q = StreamingAsOfEnrich.writer(
      events, _ => buildDf, Seq("item"), "t", "pt", Seq("price"))(
      (batch, id) => batch.collect().foreach(r =>
        got(r.getLong(0)) = (id, r.get(3))))
      .start()
    try {
      mem.addData((1L, "itemA", 15), (2L, "itemA", 3), (3L, "itemC", 9))
      q.processAllAvailable()
      // Backward hit, forward fallback (t=3 < first quote), missing key.
      assert(got(1L) == (0L, 100L))
      assert(got(2L) == (0L, 100L))
      assert(got(3L) == (0L, null))

      // Dimension refresh between triggers: next batch sees the new quote.
      series = series :+ (("itemA", 14, 140L))
      mem.addData((4L, "itemA", 15))
      q.processAllAvailable()
      assert(got(4L) == (1L, 140L))
    } finally q.stop()
  }

  test("per-batch result equals the batch as-of on the same frame") {
    import spark.implicits._
    val probes = Seq((1L, "a", 7), (2L, "a", 1), (3L, "b", 4))
      .toDF("event_id", "item", "t")
    val build = Seq(("a", 2, 20L), ("a", 6, 60L), ("b", 9, 90L))
      .toDF("item", "pt", "price")

    val mem = MemoryStream[(Long, String, Int)](spark)
    val want = AsOfJoin.join(probes, build, Seq("item"), "t", "pt",
      Seq("price")).collect().map(_.toSeq).toSet
    var streamed = Set.empty[Seq[Any]]
    val q = StreamingAsOfEnrich.writer(
      mem.toDF().toDF("event_id", "item", "t"), _ => build,
      Seq("item"), "t", "pt", Seq("price"))(
      (batch, _) => streamed ++= batch.collect().map(_.toSeq))
      .start()
    try {
      mem.addData((1L, "a", 7), (2L, "a", 1), (3L, "b", 4))
      q.processAllAvailable()
      assert(streamed == want)
    } finally q.stop()
  }
}
