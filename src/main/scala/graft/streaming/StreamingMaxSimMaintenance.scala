package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.ops.MaxSimIndex

/** Continuous token-index maintenance: a `foreachBatch` sink that keeps
  * a persisted [[graft.ops.MaxSimIndex]] fresh under streaming document
  * ingest — the late-interaction member of the index-maintenance
  * family ([[StreamingIvfMaintenance]], [[StreamingGraphMaintenance]]).
  *
  * Stream contract: one row per TOKEN — (idCol, posCol, vecCol), the
  * [[graft.ops.MaxSim]] input layout (a document upstream explodes into
  * its token rows before the sink). With `opCol` set, each row
  * additionally carries 'add' / 'delete' (a delete row needs only the
  * id — one delete row tombstones the whole document through
  * [[MaxSimIndex.delete]]; without opCol, every row is an add). Each
  * micro-batch's adds apply through [[MaxSimIndex.append]], whose
  * ROW-level (t, id, pos) replay guard makes Structured Streaming's
  * at-least-once `foreachBatch` replay converge to the single-delivery
  * index — and heals a batch whose previous attempt tore mid-append.
  * Deletes are TERMINAL until [[MaxSimIndex.compact]] folds them (the
  * IVF stance): a delete(x)+add(x) batch leaves x masked — an update
  * is delete → compact → append. Re-embeds likewise.
  *
  * The index must exist before the stream starts ([[MaxSimIndex.write]]
  * lands an initial generation even over an empty token table; reads
  * fall back to the canonical schema until the first append).
  * Single-writer assumption, as everywhere in the maintenance family.
  */
object StreamingMaxSimMaintenance {

  /** The foreachBatch body, exposed for direct (batch, id) application
    * in tests and manual backfills.
    */
  def writer(path: String, idCol: String, posCol: String,
      vecCol: String, opCol: Option[String] = None):
      (DataFrame, Long) => Unit =
    (batch, _) => {
      val s = batch.sparkSession
      val adds = opCol match {
        case None => batch
        case Some(oc) =>
          MaxSimIndex.delete(s, path,
            batch.filter(col(oc) === "delete").select(col(idCol)), idCol)
          batch.filter(col(oc) === "add")
      }
      MaxSimIndex.append(s, path, adds, idCol, posCol, vecCol)
    }

  /** Wire a token-maintenance stream into the index at `path`. Caller
    * starts it: `sink(stream, path, ckpt, ...).start()`.
    */
  def sink(stream: DataFrame, path: String, checkpointDir: String,
      idCol: String, posCol: String, vecCol: String,
      opCol: Option[String] = None): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(writer(path, idCol, posCol, vecCol, opCol))
}
