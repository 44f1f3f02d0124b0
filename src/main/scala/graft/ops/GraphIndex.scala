package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persistable kNN graph: build the [[NnDescent]] graph ONCE, write it
  * as parquet, and serve any number of [[GraphSearch]] probe batches —
  * and, crucially, KEEP IT FRESH under continuous ingest without full
  * rebuilds (the [[IvfIndex]] life cycle, for the graph family).
  *
  * Layout under `path`: one directory per generation,
  * `graph_v{n}/nodes` ((id, vec) — the vectors the graph was built
  * over; maintenance needs them to score new pairs) and
  * `graph_v{n}/edges` ((id, nbr, cos) — the directed top-k lists).
  * Because a generation is TWO parquet trees, commit is an explicit
  * `_GRAFT_COMMIT` marker written after both succeed; readers resolve
  * the highest committed version ([[liveVersion]]), so a crash mid-write
  * leaves the previous generation live and the torn one is skipped-past
  * garbage (numbered past, like IvfIndex's uncommitted leftovers).
  *
  * Incremental maintenance ([[applyMaintenanceBatch]]) is where the
  * graph index differs from IVF: an IVF add appends under its Voronoi
  * cell; a graph add must STITCH INTO the neighborhood structure. Each
  * batch:
  *   1. dedups adds in-batch and drops ids already stored (REPLAY-SAFE:
  *      a redelivered batch is a no-op and writes no new generation —
  *      like IVF, an add of a live id is NOT an upsert; dropped adds
  *      are counted and logged);
  *   2. SEEDS each genuinely-new node via [[GraphSearch.topK]] against
  *      the live graph (beam walk — |batch|·beam·k work, never a corpus
  *      scan) plus the NN-Descent bucket init WITHIN the batch (new
  *      nodes arriving together may be each other's neighbors);
  *   3. merges the symmetrized seeds as flagged arrivals
  *      ([[NnDescent.mergeArrivals]] — old nodes gain new neighbors
  *      through the reverse edges here) and runs the LOCALIZED
  *      [[NnDescent.descend]] rounds, which only touch neighborhoods
  *      holding a new edge — the whole point: per-batch cost tracks the
  *      batch's neighborhood footprint, not the corpus;
  *   4. commits `graph_v{n+1}` and deletes superseded generations.
  *
  * Deletes are a REBUILD, deliberately: removing a node leaves holes in
  * every list that held it, and backfilling those lists correctly is a
  * descent pass over the whole deleted-adjacent region — at that point
  * [[write]] over the surviving corpus is the honest operation (the
  * tombstone shortcut IVF uses has no cheap graph analogue worth its
  * staleness).
  *
  * Single-writer assumption, same as every maintenance op here.
  */
object GraphIndex {

  /** Build and persist generation 1 (or the next generation, on an
    * existing path) from scratch.
    */
  def write(spark: SparkSession, path: String, vectors: DataFrame,
      idCol: String, vecCol: String, k: Int, rounds: Int,
      maxDegree: Int = 0, simPrecision: Int = -1): Unit = {
    val edges = NnDescent.knnGraph(vectors, idCol, vecCol, k, rounds,
        maxDegree = maxDegree, simPrecision = simPrecision)
      .select(col("query_id").as("id"), col("neighbor_id").as("nbr"),
        col("cos"))
    val nodes = vectors.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
    commit(spark, path, nodes, edges)
  }

  private val versions = new VersionedTree("graph")

  /** Highest committed generation name, e.g. "graph_v3". */
  def liveVersion(spark: SparkSession, path: String): String =
    versions.liveVersion(spark, path)

  def nodes(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/${liveVersion(spark, path)}/nodes")

  /** Live edge lists (id, nbr, cos) — feed [[GraphSearch.topK]] as the
    * graph side.
    */
  def edges(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/${liveVersion(spark, path)}/edges")

  /** One micro-batch of adds — the foreachBatch body behind
    * [[graft.streaming.StreamingGraphMaintenance]]. `k`/`maxDegree`/
    * `simPrecision` must match the build (the graph has one k; the
    * caller owns that contract, as IVF callers own the codebook's).
    */
  def applyMaintenanceBatch(spark: SparkSession, path: String,
      batch: DataFrame, idCol: String, vecCol: String, k: Int,
      rounds: Int, maxDegree: Int = 0, beam: Int = 0, entries: Int = 8,
      overlay: Int = 2, simPrecision: Int = -1): Unit = {
    val deg = if (maxDegree > 0) maxDegree else 4 * k
    val stored = nodes(spark, path).localCheckpoint(eager = false)
    val adds = batch.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      // In-batch transport retry: deterministic vector choice, not
      // arrival order (the IvfIndex.applyMaintenanceBatch rule).
      .groupBy("id").agg(max("vec").as("vec"))
    val fresh = adds.join(stored.select("id"), Seq("id"), "left_anti")
      .localCheckpoint(eager = false)
    val dropped = adds.join(stored.select("id"), Seq("id"), "left_semi")
      .count()
    if (dropped > 0) System.err.println(
      s"[graft] GraphIndex.applyMaintenanceBatch: $dropped add(s) for " +
        "already-stored ids ignored (adds are not upserts; an update or " +
        "delete is a rebuild)")
    if (fresh.isEmpty) { // fully-replayed batch: no-op, no new generation
      Checkpoints.release(stored)
      Checkpoints.release(fresh)
      return
    }

    // Seeds: walk the live graph for each new vector (bounded by the
    // beam budget), plus bucket-init pairs WITHIN the batch (rounds = 0
    // knnGraph = exactly the init stage).
    val g0 = edges(spark, path)
    val seeds = GraphSearch.topK(g0, "id", "nbr",
        stored, "id", "vec", fresh, "id", "vec",
        k = k, beam = beam, rounds = 3, entries = entries,
        overlay = overlay, simPrecision = simPrecision)
      .select(col("query_id").as("id"), col("neighbor_id").as("nbr"),
        col("cos"))
    val internal = NnDescent.knnGraph(fresh, "id", "vec", k, rounds = 0,
        simPrecision = simPrecision)
      .select(col("query_id").as("id"), col("neighbor_id").as("nbr"),
        col("cos"))
    val arrivals0 = seeds.unionAll(internal)
    val arrivals = arrivals0.unionAll(arrivals0.select(
      col("nbr").as("id"), col("id").as("nbr"), col("cos")))

    // Stitch + localized descent over the grown corpus.
    val vAll = stored.unionByName(fresh)
      .select(col("id"), col("vec").as("__v"),
        Similarity.norm(col("vec")).as("__n"))
      .localCheckpoint(eager = false)
    val refined = NnDescent.descend(vAll,
      NnDescent.mergeArrivals(g0, arrivals, k), k, deg, rounds,
      simPrecision)

    commit(spark, path, stored.unionByName(fresh),
      refined.select(col("id"), col("nbr"), col("cos")))
    Checkpoints.release(vAll)
    Checkpoints.release(stored)
    Checkpoints.release(fresh)
    Checkpoints.release(refined)
    // The commit is the last read through these plans, so the checkpoints
    // their producers buried under projections — GraphSearch's final beam
    // inside `seeds`, knnGraph's final edges inside `internal` — are dead
    // too; without the tree release a long-running maintenance stream
    // pins one beam-sized + one batch-edges-sized block set per
    // micro-batch until GC (the exact leak Checkpoints.scala documents).
    Checkpoints.releaseTree(seeds)
    Checkpoints.releaseTree(internal)
  }

  // ------------------------------------------------------------ commit

  private def commit(spark: SparkSession, path: String,
      nodes: DataFrame, edges: DataFrame): Unit =
    versions.commitNext(spark, path) { gen =>
      nodes.write.mode("overwrite").parquet(s"$gen/nodes")
      edges.write.mode("overwrite").parquet(s"$gen/edges")
    }: Unit
}
