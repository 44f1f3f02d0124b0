package graft.streaming

import java.nio.file.Files

import graft.SparkTestBase
import graft.ml.Pq
import graft.ops.PqIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming IVF-PQ maintenance: a MemoryStream of (id, vec, op) rows
  * applied through the foreachBatch sink must leave the SAME index a
  * from-scratch build over the surviving corpus would produce UNDER THE
  * SAME frozen codebooks, and replays (redelivered batches, same-batch
  * updates) must converge, not duplicate.
  */
class StreamingPqMaintenanceSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val dims = 16

  // The PqIndexSpec clustered fixture: 8 one-hot axes + deterministic
  // noise — stable ADC ordering under the integer-exact model.
  private def vec(i: Long): Array[Double] = {
    val c = (i % 8).toInt
    Array.tabulate(dims)(d =>
      (if (d == c) 3.0 else 0.0) + (((i * 31 + d * 7) % 13) - 6) / 24.0)
  }

  private def corpus(ids: Seq[Long]): DataFrame =
    ids.map(i => (i, vec(i))).toDF("vec_id", "embedding")

  private def canon(df: DataFrame): Set[(Long, Long, Int, Double)] =
    df.select(col("query_id").cast("long"),
        col("neighbor_id").cast("long"), col("rank").cast("int"),
        round(col("cos"), 6))
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet

  test("stream-built index == scratch build under the same codebooks; " +
    "redelivered batch appends nothing; same-batch update serves the " +
    "new vector and replay converges") {
    // Codebooks fit ONCE over the full eventual corpus and frozen —
    // maintenance never refits, so scratch builds with the same model
    // are the exact expectation.
    val full = corpus(0L until 48L)
    val model = Pq.fit(full, "vec_id", "embedding", dims = dims, m = 4,
      k = 4, iterations = 2)
    val cent = full.filter(pmod(col("vec_id"), lit(12)) === 0)
      .select(col("vec_id").as("centroid_id"),
        col("embedding").as("centroid"))
    val path = Files.createTempDirectory("pq_stream").toString
    PqIndex.write(spark, path, corpus(0L until 24L),
      "vec_id", "embedding", cent, model)

    val mem = MemoryStream[(Long, Array[Double], String)](spark)
    val stream = mem.toDF().toDF("vec_id", "embedding", "op")
    val ckpt = Files.createTempDirectory("pq_stream_ckpt").toString
    val q = StreamingPqMaintenance.sink(stream, path, ckpt,
      "vec_id", "embedding", "op").start()
    mem.addData((24L until 36L).map(i => (i, vec(i), "add")): _*)
    q.processAllAvailable()
    mem.addData((36L until 48L).map(i => (i, vec(i), "add")): _*)
    q.processAllAvailable()
    q.stop()

    val probes = corpus(Seq(1L, 30L, 47L))
    def got() = canon(PqIndex.topK(spark, path, probes,
      "vec_id", "embedding", k = 3, candidateK = 12, nprobe = 2))
    def scratchWant(c: DataFrame): Set[(Long, Long, Int, Double)] = {
      val p = Files.createTempDirectory("pq_stream_scratch").toString
      PqIndex.write(spark, p, c, "vec_id", "embedding", cent, model)
      canon(PqIndex.topK(spark, p, probes,
        "vec_id", "embedding", k = 3, candidateK = 12, nprobe = 2))
    }
    val wantFull = scratchWant(full)
    assert(got() == wantFull && wantFull.nonEmpty)

    // Out-of-band redelivery (crash-before-checkpoint replay): the
    // touched-cell guard appends nothing.
    val live = PqIndex.liveVersion(spark, path)
    val rows = spark.read.parquet(s"$path/$live/lists").count()
    StreamingPqMaintenance.writer(path, "vec_id", "embedding", "op")(
      (24L until 36L).map(i => (i, vec(i), "add"))
        .toDF("vec_id", "embedding", "op"), 0L)
    assert(spark.read.parquet(s"$path/$live/lists").count() == rows,
      "replay appended rows")

    // Same-batch UPDATE: delete 3 + re-add 3 with a CHANGED vector
    // (id 11's pattern rebadged — same cluster, different noise), plus
    // a pure delete of 5. The writer sequences delete -> compact ->
    // append; probes must equal a scratch build over the updated
    // corpus under the same codebooks.
    val new3 = vec(11L).map(_ * 1.0)
    val batch = Seq(
      (3L, null.asInstanceOf[Array[Double]], "delete"),
      (5L, null.asInstanceOf[Array[Double]], "delete"),
      (3L, new3, "add"))
      .toDF("vec_id", "embedding", "op")
    val w = StreamingPqMaintenance.writer(path, "vec_id", "embedding",
      "op")
    w(batch, 1L)
    val updated = corpus((0L until 48L).filterNot(i => i == 3L || i == 5L))
      .unionByName(Seq((3L, new3)).toDF("vec_id", "embedding"))
    val wantUpd = scratchWant(updated)
    assert(got() == wantUpd && wantUpd.nonEmpty,
      "the update's new vector must serve, the pure delete must mask")
    // The old copy of 3 is physically gone (in-batch compact), and
    // exactly one live copy remains.
    assert(spark.read.parquet(
        s"$path/${PqIndex.liveVersion(spark, path)}/lists")
      .filter(col("neighbor_id") === 3L).count() == 1L)
    // Replay of the whole update batch converges on content.
    w(batch, 1L)
    assert(got() == wantUpd)
  }

  test("an update batch that masks EVERY stored row rebuilds from the " +
    "adds under the stored codebooks — re-adds serve, mask cleared") {
    val full = corpus(0L until 48L)
    val model = Pq.fit(full, "vec_id", "embedding", dims = dims, m = 4,
      k = 4, iterations = 2)
    val cent = full.filter(pmod(col("vec_id"), lit(12)) === 0)
      .select(col("vec_id").as("centroid_id"),
        col("embedding").as("centroid"))
    val path = Files.createTempDirectory("pq_stream_all").toString
    PqIndex.write(spark, path, corpus(Seq(7L, 11L)),
      "vec_id", "embedding", cent, model)
    val v7 = vec(23L) // changed vectors, same fixture family
    val v11 = vec(35L)
    val batch = Seq(
      (7L, null.asInstanceOf[Array[Double]], "delete"),
      (11L, null.asInstanceOf[Array[Double]], "delete"),
      (7L, v7, "add"), (11L, v11, "add"))
      .toDF("vec_id", "embedding", "op")
    val w = StreamingPqMaintenance.writer(path, "vec_id", "embedding",
      "op")
    w(batch, 0L)
    val updated = Seq((7L, v7), (11L, v11)).toDF("vec_id", "embedding")
    val probes = updated
    def got() = canon(PqIndex.topK(spark, path, probes,
      "vec_id", "embedding", k = 2, candidateK = 8, nprobe = 3))
    val scratch = Files.createTempDirectory("pq_stream_all_s").toString
    PqIndex.write(spark, scratch, updated, "vec_id", "embedding", cent,
      model)
    val want = canon(PqIndex.topK(spark, scratch, probes,
      "vec_id", "embedding", k = 2, candidateK = 8, nprobe = 3))
    assert(got() == want && want.nonEmpty,
      "whole-index update lost the re-adds")
    assert(!new java.io.File(
        s"$path/${PqIndex.liveVersion(spark, path)}/tombstones").exists(),
      "rebuild must clear the consumed mask")
    w(batch, 0L) // replay converges
    assert(got() == want)
  }
}
