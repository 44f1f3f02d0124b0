package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Concat-and-chunk sequence packing — the GPT-style pretraining batch
  * layout: documents are laid end-to-end in a deterministic total order
  * and the token stream is cut into fixed-width training sequences, so
  * no sequence is padded and every document knows exactly which
  * sequences it lands in (for attention-mask / provenance bookkeeping).
  *
  * The layout is pure prefix arithmetic: with `off(d)` = exclusive
  * running token total before doc d, the doc occupies sequences
  * `off div W` through `(off + n − 1) div W`. The only distributed
  * problem is the global cumulative sum, and it uses the
  * [[Ordinals]] shape — range-partition on the order key, local window
  * cumsums, per-partition totals turned into broadcast base offsets —
  * never a single-partition window. Two narrow passes at any scale;
  * exact long arithmetic end to end.
  */
object SeqPack {

  /** Assign each document its sequence span under concat-and-chunk
    * packing in `orderCol` order (must be unique — it defines the
    * concatenation order).
    *
    * @return (doc_id, n_tokens, first_seq, last_seq, n_seqs) for docs
    *         with ≥1 token; sequence ids are 0-based
    */
  def concatChunk(docs: DataFrame, idCol: String, nTokens: Column,
      window: Int): DataFrame = {
    require(window > 0, s"window must be > 0, got $window")
    val base = docs
      .select(col(idCol).as("doc_id"), nTokens.cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
    val parts = docs.sparkSession.sessionState.conf.numShufflePartitions
    // localCheckpoint BEFORE fanning out: `local` feeds both the tile
    // totals and the final join, and each consumer would otherwise
    // re-instantiate the repartitionByRange subtree, whose boundary
    // sampling can differ between instantiations (the round-10
    // partition-id-tiling failure mode — see ops/Ordinals). Truncation
    // makes the sampled layout physical so __pid is computed once.
    // Lifecycle: input-sized pin until the ContextCleaner — not
    // releasable here since the returned lazy frame reads it (see the
    // ops/Ordinals note for the long-session discipline).
    val ranged = base.repartitionByRange(parts, col("doc_id"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(false)
    // Exclusive local prefix sum inside each range tile.
    val wLocal = Window.partitionBy("__pid").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = ranged
      .withColumn("__loff", coalesce(sum(col("n_tokens")).over(wLocal), lit(0L)))
    // Tile token totals → exclusive base offsets (#partitions rows; the
    // triangle join is broadcast-sized by construction).
    val sizes = local.groupBy("__pid").agg(sum(col("n_tokens")).as("__cnt"))
    val offsets = sizes.alias("a")
      .join(sizes.alias("b"), col("b.__pid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(coalesce(sum(col("b.__cnt")), lit(0L)).as("__base"))
    local.join(broadcast(offsets), "__pid")
      .withColumn("__off", col("__base") + col("__loff"))
      .select(col("doc_id"), col("n_tokens"),
        expr(s"__off div $window").as("first_seq"),
        expr(s"(__off + n_tokens - 1) div $window").as("last_seq"))
      .withColumn("n_seqs", col("last_seq") - col("first_seq") + 1)
  }
}
