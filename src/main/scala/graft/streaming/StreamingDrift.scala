package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Drift

/** Continuous distribution-drift monitoring: each micro-batch is scored
  * against a STATIC reference distribution with the same PSI machinery
  * the batch gate uses ([[graft.ops.Drift.psiBins]]), via `foreachBatch`
  * — the pattern for "alert when the live feed stops looking like the
  * training corpus" without a second pipeline.
  *
  * The reference frame should be small-or-cached (it is re-scanned per
  * batch only for its one-row min/max, which psiBins lazily checkpoints
  * per call); per-batch work is the micro-batch's map-side bin reduction
  * plus a bins-sized join. The callback receives the per-bin PSI frame
  * and the batch id — route it to a metrics sink, an alert, or a table;
  * an empty micro-batch is skipped (PSI against nothing is noise).
  */
object StreamingDrift {

  def monitor(stream: DataFrame, reference: DataFrame, valueCol: String,
      nBins: Int)(onBatch: (Long, DataFrame) => Unit): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        if (!batch.isEmpty)
          onBatch(id, Drift.psiBins(reference, batch, valueCol, nBins))
      }
      .start()
}
