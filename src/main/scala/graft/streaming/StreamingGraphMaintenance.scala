package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.ops.GraphIndex

/** Continuous kNN-graph maintenance: a `foreachBatch` sink that keeps a
  * persisted [[graft.ops.GraphIndex]] stitched under streaming ingest —
  * the graph-family sibling of [[StreamingIvfMaintenance]], completing
  * the continuous-ingest story for the operators that consume the graph
  * (SemDeDup pruning, hard-negative mining, [[graft.ops.GraphSearch]]).
  *
  * Stream contract: rows carry (idCol, vecCol); with `opCol` set, each
  * row additionally carries 'add' / 'delete' (the
  * [[StreamingIvfMaintenance]] CDC shape — without it, every row is an
  * add). Deletes tombstone through [[GraphIndex.delete]] FIRST, then
  * the batch's adds apply through [[GraphIndex.applyMaintenanceBatch]],
  * which FOLDS the pending tombstones and repairs the holes in the same
  * localized descent the adds stitch through — so a delete(x)+add(x)
  * batch is an update, and a delete-only batch compacts the graph (see
  * the GraphIndex object doc).
  *
  * IDEMPOTENT under at-least-once replay: a redelivered delete matches
  * no stored id and appends nothing; already-stored adds are dropped
  * (counted + logged); a fully-replayed batch writes NO new
  * generation — Structured Streaming's foreachBatch redelivery after a
  * crash converges to the same committed graph a single delivery would
  * have produced. Same single-writer assumption as the batch ops; the
  * index must exist ([[GraphIndex.write]]) before the stream starts,
  * and `k`/`maxDegree`/`simPrecision` must match the build.
  */
object StreamingGraphMaintenance {

  /** The foreachBatch body, exposed for direct (batch, id) application
    * in tests and manual backfills.
    */
  def writer(path: String, idCol: String, vecCol: String, k: Int,
      rounds: Int, maxDegree: Int = 0, simPrecision: Int = -1,
      opCol: Option[String] = None): (DataFrame, Long) => Unit =
    (batch, _) => {
      val s = batch.sparkSession
      val adds = opCol match {
        case None => batch
        case Some(oc) =>
          GraphIndex.delete(s, path,
            batch.filter(col(oc) === "delete").select(col(idCol)), idCol)
          batch.filter(col(oc) === "add")
      }
      GraphIndex.applyMaintenanceBatch(s, path, adds, idCol, vecCol, k,
        rounds, maxDegree = maxDegree, simPrecision = simPrecision)
    }

  /** Wire a maintenance stream into the graph at `path`. Caller starts
    * it: `sink(stream, path, ckpt, ...).start()`.
    */
  def sink(stream: DataFrame, path: String, checkpointDir: String,
      idCol: String, vecCol: String, k: Int, rounds: Int,
      maxDegree: Int = 0, simPrecision: Int = -1,
      opCol: Option[String] = None): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(writer(path, idCol, vecCol, k, rounds, maxDegree,
        simPrecision, opCol))
}
