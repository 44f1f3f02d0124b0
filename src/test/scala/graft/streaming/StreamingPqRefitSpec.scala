package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import graft.ml.Pq
import graft.ops.PqIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Drift-triggered maintenance must stay QUIET on in-distribution
  * batches (pure maintenance), FIRE exactly once when a drifted cohort
  * arrives (refit on the index's own live rows), re-reference the
  * monitor on the refit generation (the same cohort no longer fires),
  * and keep the maintained index equal to a scratch build under the
  * refit-time fit — with redelivery converging, not re-firing.
  */
class StreamingPqRefitSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val dims = 16

  // Base distribution: 4 one-hot axes in the FIRST half of the dims +
  // deterministic noise — subspaces 2/3 (dims 8..15) carry only noise.
  private def baseVec(i: Long): Array[Double] = {
    val c = (i % 4).toInt
    Array.tabulate(dims)(d =>
      (if (d == c) 3.0 else 0.0) + (((i * 31 + d * 7) % 13) - 6) / 24.0)
  }

  // Drifted cohort: ONE tight cluster spiking in the subspaces the
  // base fit never saw (dims 10 and 14) — quantizes terribly under the
  // base codebooks, cleanly after a refit that has seen it.
  private def driftVec(i: Long): Array[Double] =
    Array.tabulate(dims)(d =>
      (if (d == 10 || d == 14) 3.0 else 0.0) +
        (((i * 17 + d * 5) % 11) - 5) / 30.0)

  private def frame(rows: Seq[(Long, Array[Double])]): DataFrame =
    rows.toDF("vec_id", "embedding")

  private def canon(df: DataFrame): Set[(Long, Long, Int, Double)] =
    df.select(col("query_id").cast("long"),
        col("neighbor_id").cast("long"), col("rank").cast("int"),
        round(col("cos"), 6))
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet

  test("in-distribution batches maintain without refit; a drifted " +
    "batch fires exactly one refit; the re-referenced monitor stays " +
    "quiet on the same cohort; the index equals a refit-time scratch " +
    "build; redelivery converges") {
    val base = (0L until 32L).map(i => (i, baseVec(i)))
    val model = Pq.fit(frame(base), "vec_id", "embedding", dims = dims,
      m = 4, k = 4, iterations = 2)
    val cent = frame(base).filter(pmod(col("vec_id"), lit(8)) === 0)
      .select(col("vec_id").as("centroid_id"),
        col("embedding").as("centroid"))
    val path = Files.createTempDirectory("pq_refit_idx").toString
    PqIndex.write(spark, path, frame(base), "vec_id", "embedding",
      cent, model)

    val refits = new java.util.concurrent.atomic.AtomicInteger(0)
    val mem = MemoryStream[(Long, Array[Double], String)](spark)
    val stream = mem.toDF().toDF("vec_id", "embedding", "op")
    val ckpt = Files.createTempDirectory("pq_refit_ckpt").toString
    val q = StreamingPqRefit.sink(stream, path, ckpt,
      "vec_id", "embedding", "op", threshold = 2.0, iterations = 2,
      onRefit = (_, _) => { refits.incrementAndGet(); () }).start()

    // Batch 1: more of the base distribution — maintained, no refit.
    val addsBase = (32L until 40L).map(i => (i, baseVec(i)))
    mem.addData(addsBase.map { case (i, v) => (i, v, "add") }: _*)
    q.processAllAvailable()
    assert(refits.get() == 0, "in-distribution batch fired a refit")
    def lists() = spark.read.parquet(
      s"$path/${PqIndex.liveVersion(spark, path)}/lists")
    assert(lists().count() == 40, "batch 1 must append through")

    // Batch 2: the drifted cohort — fires exactly one refit.
    val drift1 = (100L until 112L).map(i => (i, driftVec(i)))
    mem.addData(drift1.map { case (i, v) => (i, v, "add") }: _*)
    q.processAllAvailable()
    assert(refits.get() == 1, "drifted batch must fire one refit")

    // Batch 3: MORE of the same drifted cohort — the monitor is now
    // referenced on the refit generation, so it stays quiet and the
    // rows append exactly under the refit codebooks.
    val drift2 = (112L until 120L).map(i => (i, driftVec(i)))
    mem.addData(drift2.map { case (i, v) => (i, v, "add") }: _*)
    q.processAllAvailable()
    assert(refits.get() == 1,
      "the refit cohort's own distribution re-fired after re-reference")
    q.stop()
    assert(lists().count() == 60)

    // The maintained index equals a scratch build over ALL live rows
    // under the refit-TIME fit (batch 1+2 were the refit corpus; batch
    // 3 appended under those frozen refit codebooks).
    val refitCorpus = frame(base ++ addsBase ++ drift1)
    val refitModel = Pq.fit(refitCorpus, "vec_id", "embedding",
      dims = dims, m = 4, k = 4, iterations = 2)
    val all = frame(base ++ addsBase ++ drift1 ++ drift2)
    val scratch = Files.createTempDirectory("pq_refit_scr").toString
    PqIndex.write(spark, scratch, all, "vec_id", "embedding", cent,
      refitModel)
    val probes = frame(Seq((1L, baseVec(1L)), (33L, baseVec(33L)),
      (105L, driftVec(105L)), (115L, driftVec(115L))))
    def topOf(p: String) = canon(PqIndex.topK(spark, p, probes,
      "vec_id", "embedding", k = 3, candidateK = 12, nprobe = 2))
    val want = topOf(scratch)
    assert(topOf(path) == want && want.nonEmpty)
    // The drifted probe is actually served by its own cohort now.
    assert(want.exists { case (qid, nid, _, _) =>
      qid == 105L && nid >= 100L })

    // Redelivery of the refit-firing batch through a FRESH writer (a
    // restarted stream re-references from the index it finds): the
    // append guard drops every row, the re-measured cohort is in-band,
    // no second refit, nothing moves.
    val refits2 = new java.util.concurrent.atomic.AtomicInteger(0)
    val w = StreamingPqRefit.writer(spark, path, "vec_id", "embedding",
      "op", threshold = 2.0, iterations = 2,
      onRefit = (_, _) => { refits2.incrementAndGet(); () })
    val liveBefore = PqIndex.liveVersion(spark, path)
    w(drift1.map { case (i, v) => (i, v, "add") }
      .toDF("vec_id", "embedding", "op"), 1L)
    assert(refits2.get() == 0, "redelivered drifted batch re-fired")
    assert(PqIndex.liveVersion(spark, path) == liveBefore)
    assert(lists().count() == 60, "redelivery duplicated rows")
  }
}
