package graft.streaming

import scala.collection.mutable

import graft.SparkTestBase
import graft.ml.Pq
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The refit alert: in-distribution micro-batches stay silent, a
  * drifted batch fires with its ratio, in both the reference-frame and
  * pre-aggregated forms.
  */
class StreamingPqDriftSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def vec(i: Long, shift: Float): Array[Float] =
    Array.tabulate(8)(d =>
      shift + (((i * 2654435761L + d * 40503L) % 2000L) - 1000L) / 400.0f)

  private def frame(ids: Seq[Long], shift: Float) =
    ids.map(i => (i, vec(i, shift))).toDF("vec_id", "embedding")

  test("in-distribution batches stay silent; a drifted batch alerts in " +
    "both monitor forms") {
    val build = frame(0L until 60L, 0.0f)
    val model = Pq.fit(build, "vec_id", "embedding", dims = 8, m = 2,
      k = 4, iterations = 2)

    val alerts = mutable.ArrayBuffer.empty[Long]
    val mem = MemoryStream[(Long, Array[Float])](spark)
    val stream = mem.toDF().toDF("vec_id", "embedding")
    val q = StreamingPqDrift.monitor(stream, build, "vec_id", "embedding",
      model, threshold = 1.5) { (id, _) =>
      alerts.synchronized { alerts += id }: Unit
    }
    // Batch 0: same distribution (different ids) — silent.
    mem.addData((100L until 130L).map(i => (i, vec(i, 0.0f))): _*)
    q.processAllAvailable()
    assert(alerts.synchronized(alerts.isEmpty), alerts.toString)
    // Batch 1: shifted far outside every cell — fires.
    mem.addData((200L until 230L).map(i => (i, vec(i, 12.5f))): _*)
    q.processAllAvailable()
    q.stop()
    assert(alerts.synchronized(alerts.toSeq) == Seq(1L), alerts.toString)

    // Pre-aggregated form: same behavior against the build's mean error
    // computed once.
    val r = Pq.encode(build, "vec_id", "embedding", model)
      .agg(count(lit(1)), sum(col("recon_dist")).cast("long")).collect()(0)
    val meanBuild = r.getLong(1).toDouble / r.getLong(0)
    val ratios = mutable.ArrayBuffer.empty[(Long, Double)]
    val mem2 = MemoryStream[(Long, Array[Float])](spark)
    val q2 = StreamingPqDrift.monitorAgainst(
      mem2.toDF().toDF("vec_id", "embedding"), meanBuild, "vec_id",
      "embedding", model, threshold = 1.5) { (id, ratio, _) =>
      ratios.synchronized { ratios += ((id, ratio)) }: Unit
    }
    mem2.addData((100L until 130L).map(i => (i, vec(i, 0.0f))): _*)
    q2.processAllAvailable()
    mem2.addData((200L until 230L).map(i => (i, vec(i, 12.5f))): _*)
    q2.processAllAvailable()
    q2.stop()
    val got = ratios.synchronized(ratios.toSeq)
    assert(got.map(_._1) == Seq(1L) && got.head._2 > 1.5, got.toString)
  }
}
