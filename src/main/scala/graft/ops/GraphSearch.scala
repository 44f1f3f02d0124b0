package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph-guided ANN search: batch beam search over a prebuilt kNN graph
  * (the query shape of HNSW/NSG — Malkov & Yashunin TPAMI'18, Fu et al.
  * VLDB'19 — without the hierarchy: one layer, a beam per query). Given
  * the [[NnDescent.knnGraph]] output, every probe starts from a small
  * deterministic entry set and repeatedly expands its current beam's
  * unexpanded nodes through the graph's adjacency lists, keeping the
  * best `beam` candidates seen so far; after the frontier dies or
  * `rounds` expire, the beam's top-k is the answer.
  *
  * This is the standard way a BATCH of probes beats IVF recall at equal
  * scoring budget once the graph exists: IVF scores whole fixed lists
  * (`nprobe · n/nlist` per probe, blind to where the probe lands inside
  * a list), while the beam walks toward the query and only ever scores
  * neighbors-of-current-best (`≤ beam·k` per probe per round, every one
  * of them already pre-filtered by the graph's own similarity).
  *
  * Relational shape (nothing is all-pairs and nothing is per-probe
  * driver work):
  *   - ENTRY: one global entry set — the `entries` nodes with smallest
  *     salted md5 — broadcast-crossed with the probe table (|q|·entries
  *     scored pairs, the only cross join and it is entry-set-bounded).
  *   - ROUND: unexpanded beam rows equi-join the adjacency lists
  *     (candidates ≤ |q|·beam·k), anti-join away nodes already in the
  *     beam, score by two equi-joins (corpus vectors, probe vectors),
  *     then merge + per-probe top-`beam` window. All joins are keyed;
  *     the only windows are probe-keyed.
  *   - Loop discipline is the [[NnDescent]]/[[Dedup.connectedComponents]]
  *     one: each round lazily localCheckpoints, the frontier count is
  *     the materializing action (one job per round), and the previous
  *     round's blocks release immediately. The corpus/probe/adjacency
  *     frames release once the loop exits; the final beam's blocks stay
  *     for the caller (CC's fixpoint discipline).
  *
  * Determinism: md5 entry points, (cos DESC, node ASC) tie-breaks in
  * every beam cut and the final rank, and `simPrecision`-rounded cosines
  * before any rank — the same replay contract as [[NnDescent]], so a
  * DuckDB oracle can replay the search round for round. The early exit
  * (frontier = 0: every beam row expanded and nothing new survived the
  * cut) is output-equivalent to running all `rounds`: with no unexpanded
  * row, every later round generates no candidates on either engine.
  *
  * NAVIGABILITY: a kNN graph over a clustered corpus is (near-)
  * disconnected — every node's top-k is within-cluster, so no walk can
  * cross clusters and recall collapses to whichever clusters hold entry
  * points (measured: 0.22 on the 16-cluster spec fixture). The small-
  * world fix (Malkov's NSW long links; Kleinberg routing) is an OVERLAY:
  * each node gets `overlay` extra deterministic long-range edges — target
  * = the node whose dense [[Ordinals]] position equals the node's salted
  * md5 mod n — so the composite graph is connected w.h.p. and the beam
  * discards bad jumps by score while a jump INTO the probe's cluster
  * lets the local edges finish the job. The overlay is replay-exact
  * (row_number position + md5 arithmetic on both engines) and costs
  * n·overlay extra edges, same order as the graph itself.
  *
  * Like NN-Descent itself, the walk is LOCAL: recall depends on the
  * composite graph's connectivity from the entry set (measured in
  * GraphSearchSpec and tools/AnnCurves, not asserted by the oracle — the
  * gate pins the ALGORITHM).
  *
  * @param graph   kNN adjacency, one row per directed edge
  * @param corpus  node vectors the graph was built over
  * @param queries probe vectors
  * @param k       results per probe
  * @param beam    beam width (candidates retained per probe; default 2k)
  * @param rounds  max expansion rounds (early-exit on a dead frontier)
  * @param entries global entry-point count (smallest salted md5)
  * @param overlay long-range links per node added to the adjacency
  *                (0 disables; see NAVIGABILITY above)
  * @param simPrecision if ≥ 0, round cosines to this many decimals
  *                 BEFORE ranking — the cross-engine replay mode
  * @return (query_id, neighbor_id, rank, cos) — up to k rows per probe
  */
object GraphSearch {

  def topK(graph: DataFrame, gSrcCol: String, gDstCol: String,
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int, beam: Int = 0, rounds: Int = 3, entries: Int = 8,
      overlay: Int = 2, salt: String = "gs",
      simPrecision: Int = -1): DataFrame = {
    require(k >= 1 && rounds >= 0 && entries >= 1 && overlay >= 0,
      s"need k>=1, rounds>=0, entries>=1, overlay>=0; got $k/$rounds/$entries/$overlay")
    val b = if (beam > 0) beam else 2 * k
    require(b >= k, s"beam must be >= k; got $b < $k")

    val v = corpus.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("__v"),
        Similarity.norm(col(vecCol)).as("__n"))
      .localCheckpoint(eager = false)
    val q = queries.filter(col(qVecCol).isNotNull)
      .select(col(qIdCol).cast("long").as("qid"), col(qVecCol).as("__qv"),
        Similarity.norm(col(qVecCol)).as("__qn"))
      .localCheckpoint(eager = false)
    val adjBase = graph
      .select(col(gSrcCol).cast("long").as("node"),
        col(gDstCol).cast("long").as("__dst"))
    // Small-world overlay (see NAVIGABILITY): node u's j-th long link
    // targets the node at dense id-order position md5(salt:l j:u) mod n.
    // Deterministic on both engines; duplicate edges are harmless (the
    // round's candidate set dedups).
    var ordPin: Option[DataFrame] = None
    val withOverlay = if (overlay == 0) adjBase else {
      // n = |corpus| rides a broadcast 1-row frame instead of a blocking
      // driver count(): same integer modulus, one fewer sequential job
      // per topK call — these lifecycle chains are driver-bound on job
      // count (guide §1.2), and v's checkpoint materializes anyway under
      // the first beam action.
      val nRow = v.agg(count(lit(1)).as("__cnt"))
      val ord = Ordinals.assign(v.select(col("id")), Seq(col("id").asc))
        .select(col("id").as("__tgt"), col("ordinal").as("__o"))
      ordPin = Some(ord)
      val jumps = (0 until overlay).map { j =>
        v.crossJoin(broadcast(nRow))
          .select(col("id").as("node"),
            pmod(Dedup.md5Hash60(
              concat(lit(s"$salt:l$j:"), col("id").cast("string"))),
              col("__cnt")).as("__o"))
      }.reduce(_ unionAll _)
        .join(ord, Seq("__o"))
        .filter(col("node") =!= col("__tgt"))
        .select(col("node"), col("__tgt").as("__dst"))
      adjBase.unionAll(jumps)
    }
    // Traverse UNDIRECTED (forward ∪ reverse — HNSW's bidirectional
    // links): a directed kNN graph leaves low-in-degree nodes unreachable
    // even from their own cluster-mates (a node lists its neighbors, but
    // nothing need list IT back at small k). Reversal doubles the edge
    // table, not the scoring — candidates dedup before the vector joins.
    // Adjacency re-read every round: checkpoint so rounds read blocks,
    // not the builder's lineage (2n·(k+overlay) rows — graph-sized).
    val adj = withOverlay
      .unionAll(withOverlay.select(col("__dst").as("node"),
        col("node").as("__dst")))
      .localCheckpoint(eager = false)

    val cosRaw = Similarity.dot(col("__qv"), col("__nv")) /
      (col("__qn") * col("__nn"))
    val cosQ = if (simPrecision >= 0) round(cosRaw, simPrecision) else cosRaw
    def byQ = Window.partitionBy("qid")
      .orderBy(col("cos").desc, col("node").asc)
    val nv = v.select(col("id").as("node"), col("__v").as("__nv"),
      col("__n").as("__nn"))

    // Global deterministic entry set: smallest salted md5 over node ids —
    // an entries-row broadcast, shared by every probe.
    val entry = v
      .select(col("id").as("node"),
        Dedup.md5Hash60(concat(lit(s"$salt:"), col("id").cast("string")))
          .as("__h"))
      .orderBy(col("__h").asc, col("node").asc)
      .limit(entries)
      .select(col("node"))
      .join(nv, Seq("node"))

    var beamDf = q.crossJoin(broadcast(entry))
      .select(col("qid"), col("node"), cosQ.as("cos"))
      .withColumn("__r", row_number().over(byQ))
      .filter(col("__r") <= b)
      .select(col("qid"), col("node"), col("cos"), lit(false).as("__exp"))
      .localCheckpoint(eager = false)
    def frontierOf(df: DataFrame): Long = df
      .agg(coalesce(sum(when(!col("__exp"), 1L).otherwise(0L)), lit(0L)))
      .head.getLong(0)
    var frontier = frontierOf(beamDf)

    var r = 0
    while (r < rounds && frontier > 0) {
      val prev = beamDf
      // Expand every unexpanded beam row through the graph; skip nodes
      // already held (they would merge to themselves anyway — the
      // anti-join just saves their re-scoring).
      val cand = beamDf.filter(!col("__exp"))
        .select(col("qid"), col("node"))
        .join(adj, Seq("node"))
        .select(col("qid"), col("__dst").as("node"))
        .distinct()
        .join(beamDf.select(col("qid"), col("node")),
          Seq("qid", "node"), "left_anti")
      val scored = cand
        .join(nv, Seq("node"))
        .join(q, Seq("qid"))
        .select(col("qid"), col("node"), cosQ.as("cos"))
      // Merge: every surviving old row has now been expanded; arrivals
      // enter unexpanded. max(cos) dedups a re-found node (identical
      // deterministic value); max(__exp) keeps "expanded" sticky.
      // repartition(qid) is the shared-exchange trick (guide §2.4):
      // hash(qid) satisfies the (qid, node) clustering of the dedup
      // aggregate AND the beam-cut window's qid distribution, so the
      // round's merge pays ONE shuffle instead of two — and the
      // checkpoint preserves the qid partitioning, so the next round's
      // candidate dedup reuses it with no exchange at all.
      beamDf = beamDf
        .select(col("qid"), col("node"), col("cos"), lit(true).as("__exp"))
        .unionAll(scored.withColumn("__exp", lit(false)))
        .repartition(col("qid"))
        .groupBy("qid", "node")
        .agg(max("cos").as("cos"), max("__exp").as("__exp"))
        .withColumn("__r", row_number().over(byQ))
        .filter(col("__r") <= b)
        .select(col("qid"), col("node"), col("cos"), col("__exp"))
        .localCheckpoint(eager = false)
      frontier = frontierOf(beamDf)
      Checkpoints.release(prev)
      r += 1
    }

    // Rounds are over: the probe/corpus/adjacency frames are dead (every
    // beam version was materialized by its frontier count); the final
    // beam's blocks stay until the caller's hygiene, like CC's fixpoint.
    Checkpoints.release(v)
    Checkpoints.release(q)
    Checkpoints.release(adj)
    // The overlay's Ordinals.assign pinned a corpus-sized range-
    // partitioned checkpoint inside `ord`'s plan; `adj` (its only
    // consumer) is itself checkpoint-materialized or dead by now, so the
    // pin is releasable — without this every topK call leaks one
    // corpus-sized block set (per micro-batch, in the maintenance sink).
    ordPin.foreach(Checkpoints.releaseTree)

    beamDf
      .withColumn("rank", row_number().over(byQ))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("node").as("neighbor_id"),
        col("rank"), col("cos"))
  }

}
