package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.ops.{IvfIndex, Similarity}

/** Drift-TRIGGERED IVF maintenance — [[StreamingPqRefit]]'s sibling
  * for the routing layer: each micro-batch's add rows are scored for
  * coarse-routing drift against the index's own live reference
  * ([[IvfIndex.meanRoutingError]] cached in the writer's closure, the
  * batch side one broadcast-codebook assignment scan), the batch is
  * applied through the replay-safe maintenance path, and when the
  * ratio clears `threshold` the sink runs [[IvfIndex.refit]] — NEW
  * Voronoi cells sampled from what the index now holds (the
  * deterministic value-keyed rule), a full rebuild, and the monitor
  * re-references on the rebuilt tree's own error. Up here a refit IS a
  * rebuild (no frozen-codebook shortcut exists for the routing
  * layer), so `threshold` should be set to what justifies one.
  *
  * Replay: maintenance already converges (append guard, tombstone
  * idempotence); a REDELIVERED refit-firing batch re-measures under
  * the post-refit codebook — in-distribution now (its region has
  * cells), so it appends nothing and stays quiet; if it fires anyway,
  * refit over the unchanged live rows resamples the identical
  * codebook and rebuilds to the same serving state — convergent
  * either way. Single-writer, like every index mutation.
  */
object StreamingIvfRefit {

  /** The foreachBatch body, exposed for direct (batch, id) application
    * in tests and manual backfills. `onRefit(batchId, ratio)` fires
    * after each committed refit.
    */
  def writer(spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, vecCol: String, opCol: String, threshold: Double,
      centroidMod: Long, centroidCap: Long = Long.MaxValue,
      retain: Int = 1,
      onRefit: (Long, Double) => Unit = (_, _) => ()):
      (DataFrame, Long) => Unit = {
    require(threshold > 1.0,
      s"threshold is a mean-error RATIO, must be > 1: $threshold")
    // Closure state: the reference mean routing error, initialized
    // lazily and refreshed only on refit (one live-lists scan each
    // time — never per batch).
    var ref: Option[Double] = None
    (batch, id) => {
      if (ref.isEmpty)
        ref = Some(IvfIndex.meanRoutingError(spark, path))
      val refMean = ref.get
      val adds = batch.filter(col(opCol) === "add")
        .select(col(idCol), col(vecCol))
      val ratio: Double =
        if (adds.isEmpty) 0.0
        else {
          val r = Similarity.routingErrAgg(adds, idCol, vecCol,
            IvfIndex.storedCentFrame(spark, path)).collect()(0)
          if (r.getLong(0) == 0L || refMean <= 0) 0.0
          else (r.getLong(1).toDouble / r.getLong(0)) / refMean
        }
      IvfIndex.applyMaintenanceBatch(spark, path, batch, idCol, vecCol,
        opCol, retain = retain)
      if (ratio >= threshold) {
        System.err.println(s"[graft] StreamingIvfRefit: batch $id " +
          f"routing-drift ratio $ratio%.4f >= $threshold%.4f — " +
          s"resampling the codebook from the live rows and rebuilding " +
          s"$path")
        IvfIndex.refit(spark, path, centroidMod, centroidCap,
          retain = retain)
        ref = Some(IvfIndex.meanRoutingError(spark, path))
        onRefit(id, ratio)
      }
    }
  }

  /** Wire a drift-triggered maintenance stream into the index at
    * `path`. Caller starts it: `sink(...).start()`.
    */
  def sink(stream: DataFrame, path: String, checkpointDir: String,
      idCol: String, vecCol: String, opCol: String, threshold: Double,
      centroidMod: Long, centroidCap: Long = Long.MaxValue,
      retain: Int = 1,
      onRefit: (Long, Double) => Unit = (_, _) => ()):
      DataStreamWriter[Row] = {
    // ONE writer for the stream's lifetime — its closure caches the
    // reference error across batches (re-read only on refit).
    val w = writer(stream.sparkSession, path, idCol, vecCol, opCol,
      threshold, centroidMod, centroidCap, retain, onRefit)
    stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(w)
  }
}
