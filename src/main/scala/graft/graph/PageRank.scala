package graft.graph

import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._

/** Link-graph PageRank — the standard web-graph quality prior a
  * training-data pipeline uses to weight scraped documents (what
  * CommonCrawl-style curation ranks hosts with) — re-expressed as a
  * fixed number of relational iterations over an edge DataFrame.
  *
  * Arithmetic is INTEGER FIXED-POINT throughout (ranks in units of
  * 1e-12, BIGINT `div` at every division): float PageRank is
  * accumulation-order-dependent under a distributed sum, so two runs —
  * or two engines — disagree in the last ulps. Integer micro-units make
  * the result bit-identical on any engine with 64-bit integer floor
  * division (all values non-negative, so floor == truncate on both
  * Spark `div` and DuckDB `//`), which is what puts a 3-iteration run
  * under the DuckDB oracle gate (`q_pagerank`).
  *
  * Recurrence (damping 0.85, N = |nodes|, base = SCALE div N):
  * {{{
  *   r_0(v)   = base
  *   c_i(v)   = Σ_{(u,v) ∈ E} ( r_{i-1}(u) div outdeg(u) )
  *   r_i(v)   = (15 * base + 85 * c_i(v)) div 100
  * }}}
  * Dangling nodes (no out-edges) leak their mass rather than
  * redistributing it — the common simplified formulation; total mass
  * decays slightly per iteration but the ORDERING (what a quality prior
  * consumes) is standard. Multi-edges count once per edge row.
  *
  * Scale shape: each iteration is one shuffle keyed on `src` (rank →
  * edge join; the rank and degree tables are node-keyed and slim) and
  * one partially-aggregated shuffle keyed on `dst` for the contribution
  * sum. Nothing is ever collected to the driver; the edge table is
  * re-read per iteration (at 100 TB, cache/checkpoint the edge and
  * degree frames once — they are loop-invariant). Iterations are a
  * fixed small constant (quality priors converge in O(10) rounds;
  * each round is a full shuffle of the rank table, so callers pick the
  * cheapest count that stabilizes their downstream ordering).
  */
object PageRank {

  val Scale: Long = 1_000_000_000_000L

  private def idiv(a: Column, b: Column): Column =
    GraftColumnBridge.column(IntegralDivide(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Personalized PageRank: teleport mass returns ONLY to `sources`
    * (Haveliwala 2002) — proximity-to-seed scoring for link-graph
    * expansion (grow a trusted-domain set, rank candidates near known
    * positives). Same integer fixed-point contract as [[ranks]]:
    * r_0(v) = base·[v ∈ S] with base = SCALE div |S|, and each round
    * r_i(v) = (15·base·[v ∈ S] + 85·c_i(v)) div 100. The seed set is a
    * driver-side literal (personalization sets are small by definition),
    * so the teleport term is a codegen'd IN — no extra join.
    */
  def personalized(edges: DataFrame, srcCol: String, dstCol: String,
      sources: Seq[Long], iterations: Int): DataFrame = {
    require(iterations >= 0, "iterations must be >= 0")
    require(sources.nonEmpty, "need at least one source node")
    // DISTINCT seeds: a duplicated entry would shrink base (= Scale div
    // |S|) while injecting the seed's mass once — silently halving total
    // teleport mass. Seeds ABSENT from the edge list contribute nothing
    // (the node universe is the edge endpoints); callers personalizing
    // on possibly-isolated nodes should union those ids into the edge
    // frame as self-loops first.
    val seedSet = sources.distinct
    // e / nodes / outDeg are LOOP-INVARIANT and referenced once per
    // iteration (plus nodes in the init): checkpoint so the edge
    // derivation — which for q_textrank is the full bigram explode over
    // the corpus — executes once, not once per broadcast-build leg per
    // round (guide §2.4; the KmvSketch redundant-subtree fix, measured
    // here as 9 re-executions of the explode at 3 iterations). Blocks
    // release on the caller's between-query hygiene, the LmScore
    // discipline.
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .localCheckpoint(eager = false)
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst").as("node"))).distinct()
      .localCheckpoint(eager = false)
    val base = Scale / seedSet.size
    val isSeed = col("node").isin(seedSet: _*)
    val outDeg = e.groupBy(col("__src")).agg(count(lit(1)).as("__deg"))
      .localCheckpoint(eager = false)

    var rank = nodes.select(col("node"),
      when(isSeed, lit(base)).otherwise(lit(0L)).as("rank_fp"))
    for (_ <- 1 to iterations) {
      val contrib = e
        .join(rank.withColumnRenamed("node", "__src"), "__src")
        .join(outDeg, "__src")
        .select(col("__dst"), idiv(col("rank_fp"), col("__deg")).as("__share"))
        .groupBy(col("__dst"))
        .agg(sum(col("__share")).as("__c"))
      rank = nodes
        .join(contrib.withColumnRenamed("__dst", "node"), Seq("node"), "left")
        .select(col("node"),
          idiv(when(isSeed, lit(15L * base)).otherwise(lit(0L)) +
            lit(85L) * coalesce(col("__c"), lit(0L)), lit(100L)).as("rank_fp"))
    }
    rank
  }

  /** Fixed-point ranks after `iterations` rounds.
    *
    * @param edges      directed edge list; self-loops and multi-edges are
    *                   honored as written
    * @param srcCol     source node column (any orderable integral/string type)
    * @param dstCol     destination node column (same type as `srcCol`)
    * @param iterations number of update rounds (≥ 0; 0 = uniform base)
    * @return (node, rank_fp) — rank in units of 1e-12 of the initial
    *         total mass; BIGINT-exact, identical on every engine
    */
  def ranks(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int): DataFrame = {
    require(iterations >= 0, "iterations must be >= 0")
    // Loop-invariant frames checkpointed once — see [[personalized]];
    // without this the edge derivation re-executes per broadcast-build
    // leg per round (q_textrank: 9 explode re-executions at 3 rounds).
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .localCheckpoint(eager = false)
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst").as("node"))).distinct()
      .localCheckpoint(eager = false)
    // base = SCALE div N rides every row as a broadcast one-row frame; the
    // per-node init and the teleport term both derive from it, so the two
    // engines share ONE division result rather than re-deriving N.
    val base = nodes.agg(idiv(lit(Scale), count(lit(1))).as("__base"))
    val outDeg = e.groupBy(col("__src")).agg(count(lit(1)).as("__deg"))
      .localCheckpoint(eager = false)

    var rank = nodes.crossJoin(broadcast(base))
      .select(col("node"), col("__base").as("rank_fp"))
    for (_ <- 1 to iterations) {
      val contrib = e
        .join(rank.withColumnRenamed("node", "__src"), "__src")
        .join(outDeg, "__src")
        .select(col("__dst"), idiv(col("rank_fp"), col("__deg")).as("__share"))
        .groupBy(col("__dst"))
        .agg(sum(col("__share")).as("__c"))
      rank = nodes
        .join(contrib.withColumnRenamed("__dst", "node"), Seq("node"), "left")
        .crossJoin(broadcast(base))
        .select(col("node"),
          idiv(lit(15L) * col("__base") +
            lit(85L) * coalesce(col("__c"), lit(0L)), lit(100L)).as("rank_fp"))
    }
    rank
  }
}
