package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.ml.Pq
import graft.ml.Pq.PqModel
import graft.ops.PqIndex

/** Drift-TRIGGERED IVF-PQ maintenance: [[StreamingPqMaintenance]]'s
  * writer with the refit loop CLOSED — each micro-batch's add rows are
  * drift-scored against the index's own build-cohort reference under
  * the serving model ([[Pq.quantizationDrift]] semantics,
  * [[graft.ops.PqIndex.meanQuantizationError]] as the pre-aggregated
  * denominator), the batch is applied through the replay-safe
  * maintenance path, and when the ratio clears `threshold` the sink
  * runs [[graft.ops.PqIndex.refit]] — re-training the codebooks on
  * what the index now holds and re-referencing the monitor on the
  * refit generation's own error. Monitor ([[StreamingPqDrift]]) says
  * WHEN; this sink also DOES.
  *
  * Per-batch cost is one map-only encode of the batch + the
  * maintenance write; the corpus is touched only at wiring time (one
  * reference scan) and per refit EVENT (a rebuild — which is what a
  * refit is). The serving model and reference error live in the
  * writer's closure, re-read only when a refit lands: safe under the
  * index's single-writer contract (nothing else may move the live
  * generation while a maintenance stream owns it).
  *
  * Replay: the maintenance path already converges (append guard,
  * tombstone idempotence). A REDELIVERED refit-firing batch re-measures
  * under the post-refit model — in-distribution now, so it usually
  * just re-appends nothing and stays quiet; if it fires again, refit
  * over the unchanged corpus commits the identical model (integer-
  * exact Lloyd, value-keyed seeds) — convergent either way.
  */
object StreamingPqRefit {

  /** The foreachBatch body, exposed for direct (batch, id) application
    * in tests and manual backfills. `onRefit(batchId, ratio)` fires
    * after each committed refit.
    */
  def writer(spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, vecCol: String, opCol: String, threshold: Double,
      iterations: Int, retain: Int = 1,
      onRefit: (Long, Double) => Unit = (_, _) => ()):
      (DataFrame, Long) => Unit = {
    require(threshold > 1.0,
      s"threshold is a mean-error RATIO, must be > 1: $threshold")
    require(iterations >= 0, s"iterations must be >= 0: $iterations")
    // Closure state: the serving model + its build-cohort mean error,
    // initialized lazily (the index may be written after wiring but
    // before the first batch) and refreshed only on refit.
    var ref: Option[(PqModel, Double)] = None
    (batch, id) => {
      if (ref.isEmpty) {
        val live = PqIndex.liveVersion(spark, path)
        ref = Some((PqIndex.readModel(spark, s"$path/$live"),
          PqIndex.meanQuantizationError(spark, path)))
      }
      val (model, refMean) = ref.get
      // Drift of THIS batch's adds under the CURRENT model, measured
      // BEFORE the batch lands (the monitor contract: incoming cohort
      // vs build cohort).
      val adds = batch.filter(col(opCol) === "add")
        .select(col(idCol), col(vecCol))
      val ratio: Double =
        if (adds.isEmpty) 0.0
        else {
          val r = Pq.errAgg(adds, idCol, vecCol, model).collect()(0)
          // refMean == 0 (a perfectly-quantized reference — tiny
          // corpus, <= k distinct subvectors per subspace) must read
          // as "no signal", not Infinity: an unguarded divide would
          // fire a full refit REBUILD on every batch forever (the
          // recomputed reference can stay 0) — a refit storm.
          if (r.getLong(0) == 0L || refMean <= 0) 0.0
          else (r.getLong(1).toDouble / r.getLong(0)) / refMean
        }
      PqIndex.applyMaintenanceBatch(spark, path, batch, idCol, vecCol,
        opCol, retain = retain)
      if (ratio >= threshold) {
        System.err.println(s"[graft] StreamingPqRefit: batch $id " +
          f"drift ratio $ratio%.4f >= $threshold%.4f — refitting " +
          s"codebooks on the live corpus under $path")
        val m2 = PqIndex.refit(spark, path, iterations,
          retain = retain)
        ref = Some((m2, PqIndex.meanQuantizationError(spark, path)))
        onRefit(id, ratio)
      }
    }
  }

  /** Wire a drift-triggered maintenance stream into the index at
    * `path`. Caller starts it: `sink(...).start()`.
    */
  def sink(stream: DataFrame, path: String, checkpointDir: String,
      idCol: String, vecCol: String, opCol: String, threshold: Double,
      iterations: Int, retain: Int = 1,
      onRefit: (Long, Double) => Unit = (_, _) => ()):
      DataStreamWriter[Row] = {
    // ONE writer for the stream's lifetime — its closure caches the
    // serving model + reference error across batches (re-read only on
    // refit); building it per batch would re-scan the index every
    // micro-batch.
    val w = writer(stream.sparkSession, path, idCol, vecCol, opCol,
      threshold, iterations, retain, onRefit)
    stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(w)
  }
}
