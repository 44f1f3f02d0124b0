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

  test("opCol: delete rows tombstone the whole doc; a SAME-batch " +
    "delete+add is an UPDATE (delete -> compact -> append) and replay " +
    "converges; a CROSS-batch re-add stays masked until compact") {
    val path = Files.createTempDirectory("msidx_cdc").toString
    MaxSimIndex.write(spark, path, toksDf(0L until 24L),
      "id", "pos", "tv", dims = 24, numPlanes = 3, tables = 2)
    val w = StreamingMaxSimMaintenance.writer(path, "id", "pos", "tv",
      opCol = Some("op"))
    // One batch: UPDATE doc 3 (delete + re-add with CHANGED token
    // vectors — id 27's rows rebadged, same cluster, different noise)
    // and add doc 24. The writer sequences delete -> compact-inside-
    // the-batch -> append, so the new rows serve live.
    val new3 = tokRows(Seq(27L)).map { case (_, p, v) => (3L, p, v) }
    val batch = (Seq((3L, 0, Array.empty[Double], "delete")) ++
        tokRows(Seq(24L)).map { case (i, p, v) => (i, p, v, "add") } ++
        new3.map { case (i, p, v) => (i, p, v, "add") })
      .toDF("id", "pos", "tv", "op")
    w(batch, 0L)
    val probes = toksDf(Seq(3L, 24L))
    def got() = canon(MaxSimIndex.topK(spark, path, probes,
      "id", "pos", "tv", k = 3, tokenK = 8, simPrecision = 6))
    val updated = toksDf((0L until 24L).filterNot(_ == 3L) :+ 24L)
      .unionByName(new3.toDF("id", "pos", "tv"))
    val want = canon(MaxSim.topKViaAnnMd5(probes, updated,
      "id", "pos", "tv", k = 3, dims = 24, tokenK = 8, numPlanes = 3,
      tables = 2, simPrecision = 6))
    assert(got() == want && got().nonEmpty,
      "the update's NEW rows must serve (old rows folded away)")
    // The old rows are physically gone (the in-batch compact folded
    // them), not merely masked: exactly the new token rows remain, one
    // stored row per (token, table) — tables = 2.
    assert(spark.read.parquet(
        s"$path/${MaxSimIndex.liveVersion(spark, path)}/toks")
      .filter(col("id") === 3L).count() == new3.size.toLong * 2)
    // Crash-replay of the full update batch: converges on CONTENT (the
    // delete->compact->append chain re-runs; generations may advance).
    w(batch, 0L)
    assert(got() == want, "replayed update diverged")
    // CROSS-batch semantics unchanged: a pure delete is terminal until
    // compact — a LATER batch's re-add of the masked id appends nothing
    // (rows still stored) and stays invisible; compact physically drops
    // the doc, then a re-add resurrects it.
    w(Seq((7L, 0, Array.empty[Double], "delete"))
      .toDF("id", "pos", "tv", "op"), 1L)
    w(tokRows(Seq(7L)).map { case (i, p, v) => (i, p, v, "add") }
      .toDF("id", "pos", "tv", "op"), 2L)
    val probes7 = toksDf(Seq(7L, 24L))
    val surv7 = updated.filter(col("id") =!= 7L)
    assert(canon(MaxSimIndex.topK(spark, path, probes7,
        "id", "pos", "tv", k = 3, tokenK = 8, simPrecision = 6)) ==
      canon(MaxSim.topKViaAnnMd5(probes7, surv7, "id", "pos", "tv",
        k = 3, dims = 24, tokenK = 8, numPlanes = 3, tables = 2,
        simPrecision = 6)),
      "cross-batch re-add must stay masked until compact")
    MaxSimIndex.compact(spark, path)
    MaxSimIndex.append(spark, path, toksDf(Seq(7L)), "id", "pos", "tv")
    assert(canon(MaxSimIndex.topK(spark, path, probes7,
        "id", "pos", "tv", k = 3, tokenK = 8, simPrecision = 6)) ==
      canon(MaxSim.topKViaAnnMd5(probes7, updated, "id", "pos", "tv",
        k = 3, dims = 24, tokenK = 8, numPlanes = 3, tables = 2,
        simPrecision = 6)),
      "compact then re-add must resurrect")
  }
}
