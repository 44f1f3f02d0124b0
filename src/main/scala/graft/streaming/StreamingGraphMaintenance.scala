package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.ops.GraphIndex

/** Continuous kNN-graph maintenance: a `foreachBatch` sink that keeps a
  * persisted [[graft.ops.GraphIndex]] stitched under streaming ingest —
  * the graph-family sibling of [[StreamingIvfMaintenance]], completing
  * the continuous-ingest story for the operators that consume the graph
  * (SemDeDup pruning, hard-negative mining, [[graft.ops.GraphSearch]]).
  *
  * Stream contract: rows carry (idCol, vecCol) — adds only; a delete or
  * vector update is a rebuild (see the GraphIndex Scaladoc for why the
  * graph has no cheap tombstone analogue). Each micro-batch applies
  * through [[GraphIndex.applyMaintenanceBatch]]: new nodes seed into the
  * live graph via a beam walk plus in-batch bucket init, then localized
  * descent rounds touch only the neighborhoods holding a new edge.
  *
  * IDEMPOTENT under at-least-once replay: already-stored ids are
  * dropped (counted + logged), and a fully-replayed batch writes NO new
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
      rounds: Int, maxDegree: Int = 0,
      simPrecision: Int = -1): (DataFrame, Long) => Unit =
    (batch, _) => GraphIndex.applyMaintenanceBatch(
      batch.sparkSession, path, batch, idCol, vecCol, k, rounds,
      maxDegree = maxDegree, simPrecision = simPrecision)

  /** Wire a maintenance stream into the graph at `path`. Caller starts
    * it: `sink(stream, path, ckpt, ...).start()`.
    */
  def sink(stream: DataFrame, path: String, checkpointDir: String,
      idCol: String, vecCol: String, k: Int, rounds: Int,
      maxDegree: Int = 0, simPrecision: Int = -1): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(writer(path, idCol, vecCol, k, rounds, maxDegree,
        simPrecision))
}
