package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.ops.MaxSimIndex

/** Continuous token-index maintenance: a `foreachBatch` sink that keeps
  * a persisted [[graft.ops.MaxSimIndex]] fresh under streaming document
  * ingest — the late-interaction member of the index-maintenance
  * family ([[StreamingIvfMaintenance]], [[StreamingGraphMaintenance]]).
  *
  * Stream contract: one row per TOKEN — (idCol, posCol, vecCol), the
  * [[graft.ops.MaxSim]] input layout (a document upstream explodes into
  * its token rows before the sink). Each micro-batch applies through
  * [[MaxSimIndex.append]], whose ROW-level (t, id, pos) replay guard
  * makes Structured Streaming's at-least-once `foreachBatch` replay
  * converge to the single-delivery index — and heals a batch whose
  * previous attempt tore mid-append. Deletes/re-embeds are a rebuild
  * ([[MaxSimIndex.write]]), same stance as the graph index.
  *
  * The index must exist before the stream starts (write an initial
  * generation, even over an empty token table). Single-writer
  * assumption, as everywhere in the maintenance family.
  */
object StreamingMaxSimMaintenance {

  /** The foreachBatch body, exposed for direct (batch, id) application
    * in tests and manual backfills.
    */
  def writer(path: String, idCol: String, posCol: String,
      vecCol: String): (DataFrame, Long) => Unit =
    (batch, _) =>
      MaxSimIndex.append(batch.sparkSession, path, batch,
        idCol, posCol, vecCol)

  /** Wire a token-maintenance stream into the index at `path`. Caller
    * starts it: `sink(stream, path, ckpt, ...).start()`.
    */
  def sink(stream: DataFrame, path: String, checkpointDir: String,
      idCol: String, posCol: String,
      vecCol: String): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(writer(path, idCol, posCol, vecCol))
}
