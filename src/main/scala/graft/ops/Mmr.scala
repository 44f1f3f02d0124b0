package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Maximal-marginal-relevance diversification (Carbonell & Goldstein,
  * SIGIR 1998): greedily pick the candidate maximizing
  * `λ·relevance − (1−λ)·max-similarity-to-already-picked` — the standard
  * post-retrieval step that keeps a RAG context window from filling with
  * five copies of the same paragraph.
  *
  * Scale shape: MMR is inherently sequential in k, but k is a small
  * constant and the CANDIDATE pool per query is bounded (a top-N from
  * [[Similarity]]/[[IvfIndex]] — the expensive part already happened).
  * Each greedy step is relational across ALL queries at once: an
  * anti-join to drop picked candidates, a pair join against the ≤ i
  * picked vectors per query, a (query, candidate)-keyed max-sim
  * aggregate, and a row_number()=1 selection — 2 keyed shuffles per
  * step, k steps, never per-query driver work. Cost is
  * O(k · queries · N), independent of corpus size.
  *
  * Reproducibility: relevance and similarity are quantized to an
  * integer 1e-6 grid BEFORE the marginal score, and λ enters as the
  * rational p/q — the argmax compares exact longs
  * (`p·rel_µ − (q−p)·maxsim_µ`), so the (score DESC, id ASC) tie-break
  * can never flip on a last-bit float difference between engines.
  */
object Mmr {

  /** Greedy-select `k` of each query's candidates.
    *
    * @param cands (queryCol, idCol, vecCol, relCol): the bounded
    *              candidate pool per query with its relevance score
    * @param lambdaNum/lambdaDen λ = lambdaNum/lambdaDen in [0, 1]
    * @return (queryCol, idCol, pick 1..k, score_micro = the exact
    *         integer marginal score p·rel_µ − (q−p)·maxsim_µ; for
    *         pick 1 it is p·rel_µ — no picked set yet)
    */
  def select(cands: DataFrame, queryCol: String, idCol: String,
      vecCol: String, relCol: String, k: Int,
      lambdaNum: Int = 1, lambdaDen: Int = 2): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(lambdaDen > 0 && lambdaNum >= 0 && lambdaNum <= lambdaDen,
      s"lambda = $lambdaNum/$lambdaDen must lie in [0, 1]")
    // The candidate pool is bounded (queries × N rows) but its LINEAGE
    // is not — it typically hangs off a brute-force or ANN top-k whose
    // cross join must not re-run once per greedy step (each step
    // references base in both the anti-join and the pair join, and
    // step i's selected set references every earlier step). Truncate
    // once; every step then reads the materialized blocks.
    val base = cands.select(col(queryCol).as("__q"), col(idCol).as("__id"),
      col(vecCol).as("__v"),
      round(col(relCol) * 1e6).cast("long").as("__rel"))
      .localCheckpoint(false)
    val wFirst = Window.partitionBy("__q")
      .orderBy(col("__rel").desc, col("__id").asc)
    val superseded = scala.collection.mutable.ListBuffer.empty[DataFrame]
    var selected = base
      .withColumn("__r", row_number().over(wFirst)).filter(col("__r") === 1)
      .select(col("__q"), col("__id"), col("__v"), lit(1).as("pick"),
        (col("__rel") * lambdaNum).as("score_micro"))
    for (i <- 2 to k) {
      val remaining = base.join(selected.select("__q", "__id"),
        Seq("__q", "__id"), "left_anti")
      val scored = remaining
        .join(selected.select(col("__q"), col("__v").as("__sv")), Seq("__q"))
        .groupBy(col("__q"), col("__id"))
        .agg(first(col("__rel")).as("__rel"), first(col("__v")).as("__v"),
          max(round(Similarity.cosine(col("__v"), col("__sv")) * 1e6)
            .cast("long")).as("__maxsim"))
      val wBest = Window.partitionBy("__q")
        .orderBy((col("__rel") * lambdaNum -
          col("__maxsim") * (lambdaDen - lambdaNum)).desc, col("__id").asc)
      val next = scored
        .withColumn("__r", row_number().over(wBest)).filter(col("__r") === 1)
        .select(col("__q"), col("__id"), col("__v"), lit(i).as("pick"),
          (col("__rel") * lambdaNum -
            col("__maxsim") * (lambdaDen - lambdaNum)).as("score_micro"))
      // ≤ queries × i rows, but the plan references all earlier steps —
      // truncate per round or the final plan grows geometrically in k.
      superseded += selected
      selected = selected.unionByName(next).localCheckpoint(false)
    }
    // Eager finalize + explicit release (the Checkpoints contract): one
    // action materializes the whole chain, after which the superseded
    // per-step unions AND the pool-sized `base` are provably dead — the
    // returned frame reads only the final checkpoint's blocks. Without
    // this, every select() call pins its candidate pool plus k step
    // frames until the GC-driven ContextCleaner notices — the long-
    // session leak class Checkpoints.scala documents. The k step frames
    // are tiny; `base` is the pool and is the pin that matters.
    val out = selected.select(col("__q").as(queryCol), col("__id").as(idCol),
      col("pick"), col("score_micro"))
      .localCheckpoint(true)
    superseded.foreach(Checkpoints.release)
    Checkpoints.release(selected) // no-op for k = 1 (not RDD-rooted)
    Checkpoints.release(base)
    out
  }
}
