package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** NN-Descent approximate kNN-graph construction (Dong, Charikar & Li,
  * "Efficient k-nearest neighbor graph construction for generic
  * similarity measures", WWW 2011): start from a cheap bucketed guess,
  * then repeatedly score neighbors-of-neighbors — if b and c are both
  * near a, b and c are likely near each other — merging winners into
  * each node's top-k until nothing improves.
  *
  * This is the standard rung ABOVE the bucketed ANN family
  * ([[Similarity]] LSH/IVF, [[graft.ops.IvfIndex]]): those answer
  * batch probes against an index; the kNN GRAPH materializes every
  * node's neighbors at once — the input SemDeDup-style pruning, hard-
  * negative mining and graph-ANN search all want.
  *
  * Scale shape (the whole point — nothing here is all-pairs):
  *   - INIT: `initTables` independent md5-salted bucketings with a
  *     constant TARGET BUCKET SIZE; within-bucket pairs only, so init
  *     cost is Σ|bucket|² = corpus-linear at fixed bucket size (the
  *     SemDeDup / MinHash-LSH blocking discipline).
  *   - ROUND: the general neighborhood (forward ∪ reverse edges) is
  *     CAPPED at `maxDegree` per node by a similarity-ordered
  *     row_number — the paper's ρK sampling, made deterministic. The
  *     cap is what makes the round hub-proof: reverse-edge in-degree is
  *     unbounded on real corpora (a generic vector sits in everyone's
  *     list), and without the cap the pivot join below is quadratic in
  *     the hub's degree. With it, candidate generation is a pivot-keyed
  *     equi-join bounded by n·maxDegree² scored pairs per round.
  *   - Only pairs touching an edge that CHANGED last round are scored
  *     (the paper's new/old flag): rounds get cheaper as the graph
  *     settles, and the loop exits early once a round adds nothing.
  *   - Loop discipline is the [[Dedup.connectedComponents]] one: each
  *     round lazily localCheckpoints, the convergence count is the
  *     materializing action (one job per round), and the previous
  *     round's blocks are released immediately.
  *
  * Determinism: md5 init buckets, (cos DESC, nbr ASC) tie-breaks in
  * every top-k and cap, and [[graft.expr.VecDot]]'s left-to-right
  * double accumulation — the same inputs produce the same graph on any
  * partitioning, which is what lets a DuckDB oracle REPLAY the descent
  * round for round and gate the output (`simPrecision = 6` rounds each
  * cosine before it is ranked, so a cross-engine ulp can never flip a
  * mid-round rank; the early exit is output-equivalent to running all
  * `rounds`, because a round that adds nothing leaves no new flags and
  * every later round is then a no-op on both engines).
  *
  * NN-Descent is a LOCAL search: an init graph that fragments a tight
  * neighborhood into components the pivot join cannot bridge leaves
  * recall below 1 (observed ~0.93 on a 40-cluster fixture) — the gate
  * therefore replays the algorithm rather than pretending the output
  * equals brute truth; measured recall lives in NnDescentSpec.
  *
  * @param k          neighbors per node in the result
  * @param rounds     max refinement rounds (early-exit on no change)
  * @param initTables independent bucketings seeding the graph; more
  *                   tables shrink the chance a node starts with no
  *                   same-neighborhood bucket-mate
  * @param initBucketSize target init bucket size (default 8·(k+1))
  * @param maxDegree  neighborhood cap per pivot (default 4k)
  * @param simPrecision if ≥ 0, round every cosine to this many decimals
  *                   BEFORE it is ranked — the cross-engine replay mode;
  *                   -1 (default) ranks exact doubles
  * @return (query_id, neighbor_id, rank, cos) — up to k rows per node,
  *         rank 1 = nearest by cosine
  */
object NnDescent {

  def knnGraph(vectors: DataFrame, idCol: String, vecCol: String,
      k: Int, rounds: Int, initTables: Int = 2, initBucketSize: Int = 0,
      maxDegree: Int = 0, salt: String = "nnd",
      simPrecision: Int = -1): DataFrame = {
    require(k >= 1 && rounds >= 0 && initTables >= 1,
      s"need k>=1, rounds>=0, initTables>=1; got $k/$rounds/$initTables")
    val deg = if (maxDegree > 0) maxDegree else 4 * k
    val bSize = if (initBucketSize > 0) initBucketSize else 8 * (k + 1)

    // Vectors + norms, computed once: every round's scoring join and the
    // init self-joins all read this frame.
    val v = vectors.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("__v"),
        Similarity.norm(col(vecCol)).as("__n"))
      .localCheckpoint(eager = false)
    val n = v.count()
    val buckets = math.max(1L, n / bSize)

    val cosAB = cosExpr(simPrecision)
    def byCos = Window.partitionBy("id")
      .orderBy(col("cos").desc, col("nbr").asc)

    // INIT: within-bucket scored pairs, initTables salted bucketings.
    val initPairs = (0 until initTables).map { t =>
      val bt = v.withColumn("__b",
        pmod(Dedup.md5Hash60(
          concat(lit(s"$salt$t:"), col("id").cast("string"))), lit(buckets)))
      val a = bt.select(col("__b"), col("id").as("u"),
        col("__v").as("__va"), col("__n").as("__na"))
      val b = bt.select(col("__b"), col("id").as("w"),
        col("__v").as("__vb"), col("__n").as("__nb"))
      a.join(b, Seq("__b")).filter(col("u") < col("w"))
        .select(col("u"), col("w"), cosAB.as("cos"))
    }.reduce(_ unionAll _)

    // (id, nbr, cos, __new). Tables may duplicate a pair — max(cos) over
    // identical values is the deterministic dedup. The explicit
    // repartition(id) establishes the partitioning ONCE: hash(id)
    // satisfies the (id, nbr) clustering the aggregate needs AND the
    // window's own id distribution, so the dedup and the top-k rank
    // share a single exchange instead of shuffling twice (guide §2.4,
    // "two operations keyed the same way can share one exchange").
    val init = symmetrizePairs(initPairs)
      .repartition(col("id"))
      .groupBy("id", "nbr").agg(max("cos").as("cos"))
      .withColumn("__r", row_number().over(byCos))
      .filter(col("__r") <= k)
      .select(col("id"), col("nbr"), col("cos"), lit(true).as("__new"))
    val edges = descend(v, init, k, deg, rounds, simPrecision, bulk = true)

    // Every round's newCount materialized its edges checkpoint, so the
    // final graph reads its own blocks — the data-sized vector frame is
    // dead the moment the loop exits and is released HERE rather than
    // left for a GC-driven cleaner pass (the connectedComponents
    // discipline; the final `edges` blocks stay until the caller's
    // between-query hygiene, exactly like CC's fixpoint frame).
    Checkpoints.release(v)

    edges
      .withColumn("rank", row_number().over(byCos))
      .select(col("id").as("query_id"), col("nbr").as("neighbor_id"),
        col("rank"), col("cos"))
  }

  /** The cosine expression on the (__va,__na)/(__vb,__nb) pair frame,
    * optionally rounded to `simPrecision` decimals before ranking (the
    * cross-engine replay contract).
    */
  private[graft] def cosExpr(simPrecision: Int): Column = {
    val raw = Similarity.dot(col("__va"), col("__vb")) /
      (col("__na") * col("__nb"))
    if (simPrecision >= 0) round(raw, simPrecision) else raw
  }

  private def symmetrizePairs(p: DataFrame): DataFrame =
    p.select(col("u").as("id"), col("w").as("nbr"), col("cos"))
      .unionAll(p.select(col("w").as("id"), col("u").as("nbr"), col("cos")))

  /** The descent rounds, shared by [[knnGraph]] (full build) and
    * [[GraphIndex]]'s incremental maintenance: refine a flagged edge set
    * (`__new` = arrived since last processed) over the vectors `v`
    * ((id, __v, __n), caller-checkpointed) until `rounds` expire or a
    * round adds nothing.
    *
    * Each round is LOCALIZED to the neighborhoods that can change —
    * output-identical to the global formulation, cheaper when few edges
    * are new (the streaming-maintenance case, and the late rounds of a
    * full build):
    *   - candidate generation only reads pivots whose capped
    *     neighborhood holds a new edge (a pair needs a new side to pass
    *     the paper's incremental filter, so pivots without one
    *     contribute nothing — the semi-join drops them before the
    *     degree-cap window ever runs);
    *   - the merge re-ranks ONLY ids that received scored arrivals;
    *     untouched ids pass through with their flags cleared (exactly
    *     what the global merge's max(__o) would do to them).
    *
    * Same loop discipline as [[Dedup.connectedComponents]]: lazy
    * checkpoint per round, the convergence count materializes it, the
    * previous round releases immediately. Caller owns `v`'s release and
    * the final frame's blocks.
    */
  private[graft] def descend(v: DataFrame, edges0: DataFrame, k: Int,
      deg: Int, rounds: Int, simPrecision: Int,
      bulk: Boolean = false): DataFrame = {
    val cosAB = cosExpr(simPrecision)
    def byCos = Window.partitionBy("id")
      .orderBy(col("cos").desc, col("nbr").asc)
    var edges = edges0.localCheckpoint(eager = false)
    def newCount(e: DataFrame): Long = e
      .agg(coalesce(sum(when(col("__new"), 1L).otherwise(0L)), lit(0L)))
      .head.getLong(0)
    var changed = newCount(edges)

    var r = 0
    while (r < rounds && changed > 0) {
      val prev = edges
      // General neighborhood: forward ∪ reverse, deduped, similarity-
      // capped at `deg` (an edge is "new" if either direction is) —
      // computed only for pivots that can generate candidates. The
      // repartition(id) is the shared-exchange trick (guide §2.4): the
      // pivot distinct, the dedup aggregate and the degree-cap window
      // are all id-clustered, so one hash(id) shuffle serves all three
      // (the union's output partitioning is unknown, so without it each
      // of the three re-shuffles on its own).
      val sym = edges.unionAll(edges.select(col("nbr").as("id"),
        col("id").as("nbr"), col("cos"), col("__new")))
        .repartition(col("id"))
      val pivots = sym.filter(col("__new")).select(col("id")).distinct()
      val nbrs = sym
        .join(pivots, Seq("id"), "left_semi")
        .groupBy("id", "nbr")
        .agg(max("cos").as("cos"),
          (max(when(col("__new"), 1L).otherwise(0L)) === 1L).as("__new"))
        .withColumn("__r", row_number().over(byCos))
        .filter(col("__r") <= deg)
      // Pivot join: two neighbors of the same node are candidate
      // neighbors of each other. Scoring only pairs with a new side is
      // the paper's incremental trick; distinct stops the same pair
      // being scored once per shared pivot.
      val cand = nbrs.select(col("id").as("__p"), col("nbr").as("u"),
          col("__new").as("__nu"))
        .join(nbrs.select(col("id").as("__p"), col("nbr").as("w"),
          col("__new").as("__nw")), Seq("__p"))
        .filter(col("u") < col("w") && (col("__nu") || col("__nw")))
        .select(col("u"), col("w")).distinct()
      val scored = cand
        .join(v.select(col("id").as("u"), col("__v").as("__va"),
          col("__n").as("__na")), Seq("u"))
        .join(v.select(col("id").as("w"), col("__v").as("__vb"),
          col("__n").as("__nb")), Seq("w"))
        .select(col("u"), col("w"), cosAB.as("cos"))
      edges = mergeArrivals(edges, symmetrizePairs(scored), k, bulk)
        .localCheckpoint(eager = false)
      changed = newCount(edges)
      Checkpoints.release(prev)
      r += 1
    }
    edges
  }

  /** Merge scored arrivals (id, nbr, cos) into a flagged edge set —
    * current edges always survive into the merge, so each node's top-k
    * only ever improves (the termination argument), and __o
    * distinguishes "re-scored a known edge" (max → old) from a genuine
    * arrival.
    *
    * Two output-identical physical shapes:
    *   - `bulk = false` (incremental maintenance): re-rank ONLY the ids
    *     that received arrivals; untouched ids pass through an anti-join
    *     with their flags cleared. Cheapest when arrivals are a small
    *     fraction of the graph — the untouched majority is never
    *     shuffled.
    *   - `bulk = true` (full builds, where most ids receive arrivals):
    *     union EVERYTHING and re-rank per id on one hash(id) exchange.
    *     An untouched id's ≤ k rows re-rank to themselves under the
    *     same (cos DESC, nbr ASC) order, so the output is identical —
    *     but the plan drops the `affected` semi/anti pair, which
    *     re-executed the whole candidate-scoring subtree once per
    *     reference (the r17 KmvSketch disease, measured again here:
    *     the arrivals subtree ran 2× per round), and the dedup
    *     aggregate + rank window share the single repartition(id)
    *     exchange (guide §2.4).
    */
  private[graft] def mergeArrivals(edges: DataFrame, arrivals: DataFrame,
      k: Int, bulk: Boolean = false): DataFrame = {
    def byCos = Window.partitionBy("id")
      .orderBy(col("cos").desc, col("nbr").asc)
    if (bulk) {
      edges.select(col("id"), col("nbr"), col("cos"), lit(1L).as("__o"))
        .unionAll(arrivals.select(col("id"), col("nbr"), col("cos"))
          .withColumn("__o", lit(0L)))
        .repartition(col("id"))
        .groupBy("id", "nbr")
        .agg(max("cos").as("cos"), max("__o").as("__o"))
        .withColumn("__r", row_number().over(byCos))
        .filter(col("__r") <= k)
        .select(col("id"), col("nbr"), col("cos"),
          (col("__o") === 0L).as("__new"))
    } else {
      val affected = arrivals.select(col("id")).distinct()
      val merged = edges.join(affected, Seq("id"), "left_semi")
        .select(col("id"), col("nbr"), col("cos"), lit(1L).as("__o"))
        .unionAll(arrivals.select(col("id"), col("nbr"), col("cos"))
          .withColumn("__o", lit(0L)))
        .groupBy("id", "nbr")
        .agg(max("cos").as("cos"), max("__o").as("__o"))
        .withColumn("__r", row_number().over(byCos))
        .filter(col("__r") <= k)
        .select(col("id"), col("nbr"), col("cos"),
          (col("__o") === 0L).as("__new"))
      edges.join(affected, Seq("id"), "left_anti")
        .select(col("id"), col("nbr"), col("cos"), lit(false).as("__new"))
        .unionAll(merged)
    }
  }
}
