package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Checkpoints

/** Single-source BFS shortest paths over a directed edge list.
  *
  * Frontier-expansion BFS (Pregel-style, relational form): round d joins
  * the depth-(d-1) frontier to the edge list, anti-joins already-settled
  * nodes, and settles the survivors at distance d. `maxDepth` bounds the
  * rounds so the computation is a fixed pipeline an oracle can unroll
  * (DuckDB replays it as a depth-capped recursive CTE); the loop also
  * exits early once a frontier comes back empty, so on graphs whose
  * eccentricity from the source is below the cap no extra jobs run.
  *
  * Scale shape per round: one keyed shuffle joining the frontier to the
  * (src-keyed) edges, one distinct, one anti-join against the settled
  * set — state is O(V) and per-round work is O(edges out of frontier).
  * Each round's frontier and settled set are eagerly checkpointed and the
  * previous round's blocks are released the moment the new ones are
  * materialized ([[graft.ops.Checkpoints.release]]), so a deep BFS holds
  * two rounds of state, not `maxDepth` rounds, and the plan stays O(1)
  * per round instead of accreting the whole union lineage.
  */
object ShortestPaths {

  /** (node, dist) for every node reachable from `source` in ≤ `maxDepth`
    * hops along edge direction; `dist` is the true BFS distance. The
    * source itself is reported at distance 0 even if it has no edges.
    */
  def bfs(edges: DataFrame, srcCol: String, dstCol: String, source: Long,
      maxDepth: Int): DataFrame = {
    require(maxDepth >= 1, s"maxDepth must be >= 1, got $maxDepth")
    val spark = edges.sparkSession
    import spark.implicits._

    val e = edges
      .select(col(srcCol).cast("long").as("__src"),
        col(dstCol).cast("long").as("__dst"))
      .filter(col("__src") =!= col("__dst"))
      .distinct()
      .localCheckpoint(false)

    var settled = Seq((source, 0)).toDF("node", "dist").localCheckpoint(true)
    var frontier = settled.select("node").localCheckpoint(true)
    var depth = 0
    var exhausted = false
    while (depth < maxDepth && !exhausted) {
      depth += 1
      val next = frontier.join(e, frontier("node") === e("__src"))
        .select(col("__dst").as("node")).distinct()
        .join(settled.select("node"), Seq("node"), "left_anti")
        .localCheckpoint(true)
      exhausted = next.isEmpty
      val grown = settled
        .unionAll(next.select(col("node"), lit(depth).as("dist")))
        .localCheckpoint(true)
      // Both checkpoints of round d are materialized above; round d-1's
      // blocks are now unreachable (checkpoint lineage is truncated).
      Checkpoints.release(frontier)
      Checkpoints.release(settled)
      frontier = next
      settled = grown
    }
    Checkpoints.release(frontier)
    Checkpoints.release(e)
    settled.select(col("node"), col("dist").cast("int").as("dist"))
  }
}
