package graft.graph

import graft.ops.Hll
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HyperANF (Boldi, Rosa & Vigna, WWW'11): the neighborhood function
  * NF(t) = |{(u,v) : dist(u→v) ≤ t}| of a graph, estimated with one
  * HyperLogLog counter per node — the only known way to get distance
  * distributions / effective diameter on graphs where all-pairs BFS is
  * infeasible (NF is exactly the quantity a 100 TB web/link graph cannot
  * compute exactly: n BFS traversals).
  *
  * Spark-native shape: a node's counter is NOT opaque UDAF state but the
  * same bounded (node, reg, rho) register TABLE as [[graft.ops.Hll]] —
  * ≤ 256 rows per node, initialised to the singleton {node}. One
  * iteration is pure relational algebra:
  *
  *   regs(t+1) = (regs(t)  ∪  edges ⋈ regs(t) on dst)
  *                 .groupBy(node, reg).max(rho)
  *
  * i.e. every node merges its out-neighbors' counters (HLL union IS
  * per-register max), which is a key-partitioned equi-join plus a
  * combinable aggregate — map-side combine collapses duplicate
  * (node, reg) rows before the shuffle, so each round moves O(|E| + n·m)
  * scalar rows and nothing resembling a frontier set. Self-loops are
  * harmless (merging a counter into itself is a no-op) but edges are
  * deduplicated to cut join fan-out.
  *
  * Determinism: hashes are md5-derived (cross-engine reproducible — see
  * [[graft.ops.Hll]]); the per-node estimate keeps the register power sum
  * exact in a BIGINT and divides once, so DuckDB rebuilds every estimate
  * bit-for-bit. NF(t) sums per-node estimates AFTER rounding each to 4
  * decimals and casting to DECIMAL(38,4), so the corpus-level sum is
  * exact and aggregation-order-independent on both engines.
  *
  * Reference scope note: the reference pipeline has no graph stage — this
  * is an extension operator (SURVEY.md §2 extensions), implemented from
  * the published algorithm.
  */
object HyperAnf {

  /** Per-node register tables after `t` merge rounds: (node, reg, rho)
    * where the sketch over-approximates nothing and under-approximates
    * nothing of the t-hop OUT-ball of `node` (standard HLL error aside).
    */
  def ballRegisters(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct()
    // Per-round lineage truncation: mergeRound references regs TWICE
    // (union branch + join input), so an untruncated fold doubles the
    // plan per round — O(2^rounds) plan nodes that hang Catalyst on the
    // driver before any executor work. Lazy checkpoints (blocks
    // materialize at the caller's action); the LAST round stays a plain
    // plan so callers — and the plan-shape audit — still see the
    // union/keyed-max aggregation (the LabelPropagation convention).
    // neighborhoodFunction adds the eager per-round release its readout
    // pattern allows.
    (1 to rounds).foldLeft(initRegisters(e).localCheckpoint(false)) {
      (regs, r) =>
        val next = mergeRound(e, regs)
        if (r < rounds) next.localCheckpoint(false) else next
    }
  }

  /** Singleton sketch {node} per node of the (src, dst) edge frame: md5
    * of the node id's decimal string, so the oracle's
    * md5(CAST(node AS VARCHAR)) is bit-identical.
    */
  private def initRegisters(e: DataFrame): DataFrame = {
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    Hll.registers(
      nodes.select(col("node"), col("node").cast("string").as("__item")),
      "__item", Seq("node"))
  }

  /** One HyperANF round: every node merges its out-neighbors' counters —
    * regs ∪ (edges ⋈ regs on dst), reduced by per-(node, reg) max. The
    * ONE copy of the merge recurrence; both entry points fold over it.
    */
  private def mergeRound(e: DataFrame, regs: DataFrame): DataFrame =
    regs
      .union(e.join(regs, e("dst") === regs("node"))
        .select(col("src").as("node"), col("reg"), col("rho")))
      .groupBy(col("node"), col("reg"))
      .agg(max(col("rho")).as("rho"))

  /** Per-node ball-size estimate from a (node, reg, rho) table —
    * [[Hll.estimateBy]] keyed on the node.
    */
  def ballEstimates(regs: DataFrame): DataFrame =
    Hll.estimateBy(regs, Seq("node"))
      .withColumnRenamed("hll_est", "ball_est")

  /** The neighborhood function: one row per t ∈ [0, rounds] —
    * (t, nf, nf_frac) where nf ≈ # ordered pairs within distance ≤ t
    * (an exact DECIMAL(38,4) sum of 4-decimal-rounded per-node
    * estimates, read out as DOUBLE) and nf_frac = nf / nf(rounds) — the
    * effective-diameter readout: the smallest t with nf_frac ≥ 0.9 is
    * the standard 90%-effective-diameter estimate (Boldi et al. use
    * interpolation; the monotone fraction column carries the same
    * information).
    */
  def neighborhoodFunction(edges: DataFrame, srcCol: String,
      dstCol: String, rounds: Int): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    val spark = edges.sparkSession
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct()
      // Referenced by every round's join; materialise once.
      .localCheckpoint(eager = false)
    // NF(t) is a ONE-ROW aggregate of round t's register table, so each
    // round's readout is collected eagerly — that action doubles as the
    // round's checkpoint materializer (the connectedComponents trick),
    // after which round t−1's blocks are provably dead and released
    // immediately ([[graft.ops.Checkpoints.release]]). The alternative —
    // a lazy union of per-round aggregates — pins EVERY round's register
    // table until the caller's final action: rounds × O(n·m) rows of
    // block storage, the session-degrading leak the Checkpoints header
    // documents.
    def nfOf(regs: DataFrame): Option[Double] =
      ballEstimates(regs)
        .agg(sum(round(col("ball_est"), 4).cast("decimal(38,4)")).as("nf"))
        // Exact DECIMAL accumulation; DOUBLE readout (≤ 4 fractional
        // digits, well under 2^53 — the cast is exact) so both engines
        // print identically. An EMPTY graph sums nothing → None, kept as
        // a NULL nf row (the readout contract EmptyInputSpec pins).
        .select(col("nf").cast("double")).head match {
          case row if row.isNullAt(0) => None
          case row => Some(row.getDouble(0))
        }
    // One register table threaded through all rounds (NOT rebuilt per t —
    // that would be O(rounds²) joins); lineage truncated each round so
    // round r's plan doesn't replay rounds 1..r-1.
    var regs = initRegisters(e).localCheckpoint(eager = false)
    val nfs = Array.ofDim[Option[Double]](rounds + 1)
    nfs(0) = nfOf(regs)
    for (t <- 1 to rounds) {
      val prev = regs
      regs = mergeRound(e, regs).localCheckpoint(eager = false)
      nfs(t) = nfOf(regs)
      graft.ops.Checkpoints.release(prev)
    }
    graft.ops.Checkpoints.release(regs)
    graft.ops.Checkpoints.release(e)
    // nf_frac against the MAX round — matching the oracle's
    // max(nf) OVER (): the exact NF is monotone in t, but the HLL
    // ESTIMATE being summed is not strictly so across the
    // linear-counting→raw estimator crossover, and dividing by the last
    // round could read nf_frac > 1 where the oracle never does. Round 6
    // via HALF_UP on BigDecimal.valueOf — exactly Spark's `round(double)`
    // semantics, so the driver-built frame is bit-identical to the old
    // window readout.
    val maxNf = nfs.flatten match {
      case arr if arr.isEmpty => None
      case arr => Some(arr.max)
    }
    def r6(x: Double): Double =
      if (x.isNaN || x.isInfinite) x // matches Spark round() on non-finite
      else java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    import spark.implicits._
    nfs.toIndexedSeq.zipWithIndex
      .map { case (nf, t) =>
        (t, nf, for (n <- nf; m <- maxNf) yield r6(n / m)) }
      .toDF("t", "nf", "nf_frac")
  }
}
