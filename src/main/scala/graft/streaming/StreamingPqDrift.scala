package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ml.Pq
import graft.ml.Pq.PqModel

/** Continuous quantization-drift monitoring for frozen-codebook PQ
  * maintenance ([[StreamingPqMaintenance]]): every micro-batch of
  * incoming vectors is scored with [[graft.ml.Pq.quantizationDrift]]
  * against a STATIC build-cohort reference under the SERVING model —
  * the "when to refit" alert. Appends are exact under stale codebooks;
  * what decays silently as the corpus drifts is ADC recall, and the
  * exact integer `recon_dist` the encoder already computes is its
  * cheapest faithful proxy (one map-only encode per batch; the
  * reference side's encode re-runs per batch — pass a SMALL build
  * sample, or pre-aggregate once and use [[monitorAgainst]]).
  *
  * The callback receives (batchId, drift frame) for every non-empty
  * batch whose `drift_ratio` clears `threshold` — route it to the
  * refit scheduler. The monitor never mutates the index; pair it with
  * the maintenance sink on the same stream.
  */
object StreamingPqDrift {

  def monitor(stream: DataFrame, buildSample: DataFrame, idCol: String,
      vecCol: String, model: PqModel, threshold: Double)(
      onDrift: (Long, DataFrame) => Unit): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        if (!batch.isEmpty) {
          val d = Pq.quantizationDrift(buildSample, batch, idCol, vecCol,
            model)
          val row = d.collect()(0) // one row by construction
          // drift_ratio is SQL-NULL when a cohort lands empty after the
          // null-vector filter (an all-null batch, or an empty build
          // sample) — no signal, not an alarm; a bare getDouble here
          // would NPE and kill the monitoring stream.
          val i = row.fieldIndex("drift_ratio")
          if (!row.isNullAt(i) && row.getDouble(i) >= threshold)
            onDrift(id, d)
        }
      }
      .start()

  /** [[monitor]] with the build cohort's mean error PRE-AGGREGATED
    * (meanBuildErr = Σ recon_dist / n over the build corpus, computed
    * once at build time): per-batch work is then one encode + one
    * aggregation of the batch alone — the shape for reference corpora
    * too large to re-encode per trigger.
    */
  def monitorAgainst(stream: DataFrame, meanBuildErr: Double,
      idCol: String, vecCol: String, model: PqModel, threshold: Double)(
      onDrift: (Long, Double, Double) => Unit): StreamingQuery = {
    require(meanBuildErr > 0, s"meanBuildErr must be > 0: $meanBuildErr")
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        if (!batch.isEmpty) {
          val r = Pq.errAgg(batch, idCol, vecCol, model).collect()(0)
          val n = r.getLong(0)
          if (n > 0) {
            val ratio = (r.getLong(1).toDouble / n) / meanBuildErr
            if (ratio >= threshold) onDrift(id, ratio, meanBuildErr)
          }
        }
      }
      .start()
  }
}
