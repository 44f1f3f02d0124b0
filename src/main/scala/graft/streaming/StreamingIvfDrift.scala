package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.IvfIndex

/** Continuous coarse-ROUTING drift monitoring for a persisted
  * [[graft.ops.IvfIndex]] under streaming maintenance
  * ([[StreamingIvfMaintenance]]) — [[StreamingPqDrift]]'s sibling for
  * the routing layer: every micro-batch of incoming vectors is scored
  * with [[IvfIndex.routingDrift]] against the index's own stored
  * rows+codebook (the build cohort the artifact already materializes —
  * the stored `list` key IS the assignment, so the reference side is
  * one equi-join, no argmax), and batches whose `drift_ratio` clears
  * `threshold` reach the callback. The IVF refit is a rebuild with a
  * re-clustered codebook ([[graft.ml.KMeans.centroidFrame]] +
  * [[IvfIndex.write]]) — unlike the PQ side there is no
  * frozen-codebook fast path to close automatically, so this monitor
  * stays a MONITOR: route the alarm to the rebuild scheduler.
  *
  * The reference side re-scans the live lists per firing batch — pair
  * with [[monitorAgainst]] (pre-aggregated mean error) when the index
  * is too large to re-score per trigger.
  */
object StreamingIvfDrift {

  def monitor(stream: DataFrame, path: String, idCol: String,
      vecCol: String, threshold: Double)(
      onDrift: (Long, DataFrame) => Unit): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        if (!batch.isEmpty) {
          val d = IvfIndex.routingDrift(batch.sparkSession, path, batch,
            idCol, vecCol)
          val row = d.collect()(0) // one row by construction
          // drift_ratio is SQL-NULL when a cohort lands empty after
          // the null-vector filter (an all-null batch, or an
          // all-tombstoned index) — no signal, not an alarm; a bare
          // getDouble here would NPE and kill the monitoring stream.
          val i = row.fieldIndex("drift_ratio")
          if (!row.isNullAt(i) && row.getDouble(i) >= threshold)
            onDrift(id, d)
        }
      }
      .start()

  /** [[monitor]] against a PRE-AGGREGATED reference mean error
    * (Σ quantized slack / n over the build corpus — read it once from
    * [[graft.ops.IvfIndex.routingDrift]]'s build columns at wiring
    * time): per-batch work is then one broadcast-codebook assignment
    * scan of the batch alone.
    */
  def monitorAgainst(stream: DataFrame, path: String,
      meanBuildErr: Double, idCol: String, vecCol: String,
      threshold: Double)(
      onDrift: (Long, Double, Double) => Unit): StreamingQuery = {
    require(meanBuildErr > 0, s"meanBuildErr must be > 0: $meanBuildErr")
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val r = graft.ops.Similarity.routingErrAgg(batch, idCol,
            vecCol, IvfIndex.storedCentFrame(spark, path))
            .collect()(0)
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
