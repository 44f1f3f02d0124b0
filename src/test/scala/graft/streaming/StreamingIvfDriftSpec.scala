package graft.streaming

import java.nio.file.Files

import scala.collection.mutable

import graft.SparkTestBase
import graft.ops.IvfIndex
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The IVF routing-drift alert: in-distribution micro-batches stay
  * silent, a cohort off every Voronoi cell fires with its ratio, in
  * both the artifact-referenced and pre-aggregated forms.
  */
class StreamingIvfDriftSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val dims = 8

  // 6 loose one-hot clusters (axes 0..5); axes 6/7 belong to no cell.
  private def vec(i: Long, axis: Int): Array[Double] =
    Array.tabulate(dims)(d =>
      (if (d == axis) 10.0 else 0.0) + ((i * 31 + d * 7) % 13) * 0.1)

  private def frame(ids: Seq[Long], axis: Long => Int) =
    ids.map(i => (i, vec(i, axis(i)))).toDF("vec_id", "embedding")

  test("in-distribution batches stay silent; an off-codebook batch " +
    "alerts in both monitor forms") {
    val corpus = frame(0L until 240L, i => (i % 6).toInt)
    val codebook = (0 until 6).map(c =>
      (c.toLong, Array.tabulate(dims)(d => if (d == c) 10.0 else 0.5)))
      .toDF("centroid_id", "centroid")
    val path = Files.createTempDirectory("ivf_drift_mon").toString
    IvfIndex.write(path, corpus, "vec_id", "embedding", codebook)

    val alerts = mutable.ArrayBuffer.empty[Long]
    val mem = MemoryStream[(Long, Array[Double])](spark)
    val q = StreamingIvfDrift.monitor(
      mem.toDF().toDF("vec_id", "embedding"), path,
      "vec_id", "embedding", threshold = 1.5) { (id, _) =>
      alerts.synchronized { alerts += id }: Unit
    }
    // Batch 0: same clusters, fresh ids — silent.
    mem.addData((1000L until 1030L).map(i => (i, vec(i, (i % 6).toInt))): _*)
    q.processAllAvailable()
    assert(alerts.synchronized(alerts.isEmpty), alerts.toString)
    // Batch 1: one-hot on the ownerless axis — fires.
    mem.addData((2000L until 2030L).map(i => (i, vec(i, 7))): _*)
    q.processAllAvailable()
    q.stop()
    assert(alerts.synchronized(alerts.toSeq) == Seq(1L), alerts.toString)

    // Pre-aggregated form: reference mean read once from the
    // stored-cohort columns of routingDrift.
    val ref = IvfIndex.routingDrift(spark, path,
      corpus.limit(1), "vec_id", "embedding").collect()(0)
    val meanBuild = ref.getLong(1).toDouble / ref.getLong(0)
    val ratios = mutable.ArrayBuffer.empty[(Long, Double)]
    val mem2 = MemoryStream[(Long, Array[Double])](spark)
    val q2 = StreamingIvfDrift.monitorAgainst(
      mem2.toDF().toDF("vec_id", "embedding"), path, meanBuild,
      "vec_id", "embedding", threshold = 1.5) { (id, ratio, _) =>
      ratios.synchronized { ratios += ((id, ratio)) }: Unit
    }
    mem2.addData((1000L until 1030L).map(i => (i, vec(i, (i % 6).toInt))): _*)
    q2.processAllAvailable()
    mem2.addData((2000L until 2030L).map(i => (i, vec(i, 7))): _*)
    q2.processAllAvailable()
    q2.stop()
    val got = ratios.synchronized(ratios.toSeq)
    assert(got.map(_._1) == Seq(1L) && got.head._2 > 1.5, got.toString)
  }
}
