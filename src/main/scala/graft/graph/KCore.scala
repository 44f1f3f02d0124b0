package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-round k-core peeling: repeatedly delete nodes of degree < k
  * (with their edges). The k-core is the fixpoint; `rounds` bounds the
  * iterations so the computation is a fixed relational pipeline any
  * engine reproduces (`q_kcore` unrolls the same rounds in SQL). On
  * real graphs peeling converges in a few rounds — spam-farm cores and
  * dense link communities surface long before the worst-case bound —
  * and callers can probe `count` stability across two calls when they
  * need the exact fixpoint.
  *
  * Scale shape per round: one degree count (edge-keyed partial agg, both
  * directions) and two semi-joins filtering the edge list — all keyed
  * shuffles, no collects; the surviving-edge frame is lazily
  * checkpointed so round r's plan stays O(1), not O(r) (the same
  * lineage discipline as [[graft.ops.Dedup.connectedComponents]]).
  */
object KCore {

  /** Surviving (node, degree) after `rounds` peels at threshold `k`.
    * Degree is within the surviving subgraph; every reported degree ≥ k
    * once converged.
    */
  def peel(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1)
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("__a"),
        greatest(col(srcCol), col(dstCol)).as("__b"))
      .filter(col("__a") =!= col("__b"))
      .distinct()
      .localCheckpoint(false)

    def degrees(e: DataFrame): DataFrame =
      e.select(col("__a").as("node"))
        .unionAll(e.select(col("__b")))
        .groupBy("node").agg(count(lit(1)).as("degree"))

    var e = und
    // Intermediate rounds checkpoint EAGERLY so round r−1's blocks are
    // provably dead the moment round r materializes — and are released
    // right then ([[graft.ops.Checkpoints.release]], the
    // connectedComponents/ShortestPaths discipline) instead of pinning
    // every peel's surviving-edge set until the GC-driven cleaner runs.
    // The LAST round stays a plain plan (callers and the plan-shape
    // audit still see the semi-join/degree aggregation), so its input —
    // the latest checkpoint — is the one frame intentionally left live.
    var lastCkpt = und
    for (r <- 1 to rounds) {
      val keep = degrees(e).filter(col("degree") >= k).select("node")
      e = e
        .join(keep.withColumnRenamed("node", "__a"), Seq("__a"), "left_semi")
        .join(keep.withColumnRenamed("node", "__b"), Seq("__b"), "left_semi")
      if (r < rounds) {
        e = e.localCheckpoint(true)
        graft.ops.Checkpoints.release(lastCkpt)
        lastCkpt = e
      }
    }
    degrees(e).filter(col("degree") >= k)
  }
}
