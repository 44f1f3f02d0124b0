package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY.md §4 scale notes): when one
  * join key carries a disproportionate share of the big side ("hot item"),
  * a plain shuffle join lands that key's every row in ONE task. Salting
  * splits the hot key across `numSalts` buckets: the big side derives a
  * deterministic salt from a high-cardinality column, the small side is
  * replicated once per salt value, and the join key becomes
  * (keys..., salt) — same rows out, `numSalts`-way parallelism in.
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`) handles
  * moderate skew without code changes; explicit salting remains the tool
  * when a single key exceeds what post-shuffle splitting can rebalance
  * (e.g. one key = half the table) or when AQE is unavailable (streaming
  * micro-batches).
  *
  * The salt is `pmod(xxhash64(saltCol), numSalts)` — DETERMINISTIC, unlike
  * the usual `rand()` recipe: re-runs produce identical partitioning (no
  * nondeterministic-expression optimizer barriers, reproducible output
  * under retries/speculation). `saltCol` must be high-cardinality within
  * each key group (a row id, message id, timestamp) or the salt cannot
  * spread the hot key.
  */
object SkewJoin {

  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      saltCol: String,
      numSalts: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(numSalts > 0, "numSalts must be positive")
    // Big-side-preserving types only: a right/full join would emit each
    // UNMATCHED small-side row once per salt replica.
    val allowed = Set("inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti")
    require(allowed.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin preserves only the big (left) side; '$joinType' would " +
        "duplicate unmatched small-side rows per salt")
    val salted = big.withColumn("__salt",
      pmod(xxhash64(col(saltCol)), lit(numSalts)))
    // Replicated build side: numSalts copies — small by contract, so the
    // blow-up is bounded and usually still broadcastable.
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(numSalts - 1L))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
