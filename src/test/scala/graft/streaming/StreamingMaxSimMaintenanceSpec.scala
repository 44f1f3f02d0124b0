package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import graft.ops.{MaxSim, MaxSimIndex}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming token-index maintenance: a MemoryStream of token rows
  * applied through the foreachBatch sink must leave the SAME index a
  * from-scratch batch build over the full corpus would, and replays
  * (including a torn batch's redelivery) must converge, not duplicate.
  */
class StreamingMaxSimMaintenanceSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // The MaxSimSpec clustered fixture: 4 tokens per doc.
  private def tokRows(ids: Seq[Long]): Seq[(Long, Int, Array[Double])] =
    for {
      i <- ids
      t <- 0 until 4
    } yield {
      val axis = (i.toInt % 6) * 4 + t
      val v = Array.tabulate(24)(d =>
        (if (d == axis) 3.0 else 0.0) + (((i * 31 + d * 7 + t * 13) % 11) - 5) / 20.0)
      (i, t, v)
    }

  private def toksDf(ids: Seq[Long]): DataFrame =
    tokRows(ids).toDF("id", "pos", "tv")

  private def canon(df: DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
      math.rint(r.getDouble(3) * 1e6) / 1e6)).toSet

  test("stream-built index == batch build; redelivered batch is a no-op") {
    val path = Files.createTempDirectory("msidx_stream").toString
    MaxSimIndex.write(spark, path, toksDf(0L until 24L),
      "id", "pos", "tv", dims = 24, numPlanes = 3, tables = 2)

    val mem = MemoryStream[(Long, Int, Array[Double])](spark)
    val stream = mem.toDF().toDF("id", "pos", "tv")
    val ckpt = Files.createTempDirectory("msidx_ckpt").toString
    val q = StreamingMaxSimMaintenance.sink(stream, path, ckpt,
      "id", "pos", "tv").start()
    mem.addData(tokRows(24L until 36L): _*)
    q.processAllAvailable()
    mem.addData(tokRows(36L until 48L): _*)
    q.processAllAvailable()
    q.stop()

    // Out-of-band redelivery of batch 1 (crash-before-checkpoint
    // replay): the row-level guard appends nothing.
    val before = spark.read.parquet(
      s"$path/${MaxSimIndex.liveVersion(spark, path)}/toks").count()
    StreamingMaxSimMaintenance.writer(path, "id", "pos", "tv")(
      toksDf(24L until 36L), 0L)
    val after = spark.read.parquet(
      s"$path/${MaxSimIndex.liveVersion(spark, path)}/toks").count()
    assert(before == after, "replay appended rows")

    // Probe parity: streamed index == scratch build == inline ANN path.
    val all = toksDf(0L until 48L)
    val probes = toksDf(Seq(1L, 30L, 47L))
    val got = canon(MaxSimIndex.topK(spark, path, probes,
      "id", "pos", "tv", k = 3, tokenK = 8, simPrecision = 6))
    val want = canon(MaxSim.topKViaAnnMd5(probes, all, "id", "pos", "tv",
      k = 3, dims = 24, tokenK = 8, numPlanes = 3, tables = 2,
      simPrecision = 6))
    assert(got == want && got.nonEmpty)
  }

  test("opCol: delete rows tombstone the whole doc, deletes are " +
    "terminal until compact, replayed batch appends nothing") {
    val path = Files.createTempDirectory("msidx_cdc").toString
    MaxSimIndex.write(spark, path, toksDf(0L until 24L),
      "id", "pos", "tv", dims = 24, numPlanes = 3, tables = 2)
    val w = StreamingMaxSimMaintenance.writer(path, "id", "pos", "tv",
      opCol = Some("op"))
    // One batch: delete doc 3 (a single delete row suffices) and add
    // doc 24. The IVF stance: a delete(x)+add(x) batch leaves x masked.
    val batch = (Seq((3L, 0, Array.empty[Double], "delete")) ++
        tokRows(Seq(24L)).map { case (i, p, v) => (i, p, v, "add") } ++
        tokRows(Seq(3L)).map { case (i, p, v) => (i, p, v, "add") })
      .toDF("id", "pos", "tv", "op")
    w(batch, 0L)
    val probes = toksDf(Seq(3L, 24L))
    def got() = canon(MaxSimIndex.topK(spark, path, probes,
      "id", "pos", "tv", k = 3, tokenK = 8, simPrecision = 6))
    val surv = toksDf((0L until 24L).filterNot(_ == 3L) :+ 24L)
    val want = canon(MaxSim.topKViaAnnMd5(probes, surv, "id", "pos", "tv",
      k = 3, dims = 24, tokenK = 8, numPlanes = 3, tables = 2,
      simPrecision = 6))
    assert(got() == want && got().nonEmpty,
      "doc 3 must stay masked (delete terminal until compact)")
    // Crash-replay of the full batch: delete already tombstoned, adds
    // already stored — nothing changes.
    val live = MaxSimIndex.liveVersion(spark, path)
    val rows = spark.read.parquet(s"$path/$live/toks").count()
    val tombs = spark.read.parquet(s"$path/$live/tombstones").count()
    w(batch, 0L)
    assert(spark.read.parquet(s"$path/$live/toks").count() == rows)
    assert(spark.read.parquet(s"$path/$live/tombstones").count() == tombs)
    assert(got() == want)
    // compact → re-append resurrects doc 3.
    MaxSimIndex.compact(spark, path)
    MaxSimIndex.append(spark, path, toksDf(Seq(3L)), "id", "pos", "tv")
    val full = toksDf(0L until 25L)
    val wantFull = canon(MaxSim.topKViaAnnMd5(probes, full,
      "id", "pos", "tv", k = 3, dims = 24, tokenK = 8, numPlanes = 3,
      tables = 2, simPrecision = 6))
    assert(got() == wantFull)
  }
}
