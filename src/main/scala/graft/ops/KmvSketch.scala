package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KMV / theta sketch (Beyer et al., SIGMOD'07; Dasgupta et al.'s theta
  * unions): keep the k MINIMUM distinct hash values per key — a uniform
  * sample of the hash space that answers distinct-count AND, unlike HLL,
  * set-EXPRESSION cardinalities (intersection, difference) between
  * sketches. Completes the engine's mergeable-sketch family:
  * [[graft.text.CountMin]] (frequencies), [[Hll]] (distinct counts),
  * KMV (distinct set algebra).
  *
  * Like the others, the sketch is a BOUNDED AGGREGATE TABLE — (key, h,
  * rk) with rk ≤ k — so the engine's machinery does the heavy lifting:
  * build is distinct + one key-partitioned window over ≤ |distinct|
  * rows; merge is union + re-rank; estimates are joins over ≤ k-row
  * tables. md5-derived hashes make every engine rebuild it
  * bit-identically.
  *
  * Estimators (M = 2^60 hash space): with a pair's merged k-th smallest
  * θ (M when unsaturated — then the sketches are complete and results
  * are EXACT): union ≈ (k−1)·M/θ, intersection ≈ |{h < θ in both}|·M/θ.
  * ρ and θ are exact integers; the single float division keeps the
  * estimate engine-exact.
  */
object KmvSketch {

  val M: Double = 1152921504606846976.0 // 2^60

  /** (key, h, rk): the k smallest distinct 60-bit hashes per key. */
  def build(items: DataFrame, keyCol: String, itemCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    items.select(col(keyCol).as("key"), Dedup.md5Hash60(col(itemCol)).as("h"))
      .distinct()
      .withColumn("rk",
        row_number().over(Window.partitionBy(col("key")).orderBy(col("h"))))
      .filter(col("rk") <= k)
  }

  /** Pairwise (key_a < key_b) intersection and union estimates from the
    * sketch table: (key_a, key_b, theta_saturated, est_inter, est_union).
    */
  def pairEstimates(sk0: DataFrame, k: Int): DataFrame = {
    // The sketch table is BOUNDED (≤ k rows per key — sketch-sized, never
    // data-sized), yet it feeds SIX plan legs below (both crossJoin key
    // legs of `pairs`, twice, plus the fromA/fromB probe sides) — and
    // measured at sf0.1 the optimizer re-executed the full build subtree
    // (distinct + per-key top-k window over the corpus) once per leg:
    // 6 identical window stages, 8 re-reads of the upstream cache,
    // 2.3× the query's useful work. Materializing the sketch once turns
    // every leg into a scan of ≤ |keys|·k checkpointed rows (the
    // "checkpoint model-sized state, recompute data-sized" rule).
    // coalesce(8): the window that builds the sketch hash-partitions by
    // key, so only |keys| of the session's shuffle partitions are
    // non-empty — checkpointing all of them spreads ≤ |keys|·k rows over
    // 32+ mostly-empty blocks that every one of the six legs then
    // schedules tasks for. Eight partitions bound the block count (and
    // the per-leg task count) without re-shuffling; the upstream
    // exchange's width is untouched.
    val sk = sk0.coalesce(8).localCheckpoint(eager = true)
    val keys = sk.select(col("key")).distinct()
    val pairs = keys.select(col("key").as("key_a"))
      .crossJoin(keys.select(col("key").as("key_b")))
      .filter(col("key_a") < col("key_b"))
    val fromA = pairs.join(sk.select(col("key").as("key_a"), col("h")),
      Seq("key_a")).select(col("key_a"), col("key_b"), col("h"),
      lit(1).as("__a"), lit(0).as("__b"))
    val fromB = pairs.join(sk.select(col("key").as("key_b"), col("h")),
      Seq("key_b")).select(col("key_a"), col("key_b"), col("h"),
      lit(0).as("__a"), lit(1).as("__b"))
    val merged = fromA.unionByName(fromB)
      .groupBy(col("key_a"), col("key_b"), col("h"))
      .agg(max(col("__a")).as("in_a"), max(col("__b")).as("in_b"))
    val w = Window.partitionBy(col("key_a"), col("key_b")).orderBy(col("h"))
    // θ = merged k-th smallest; 2^60 when the union is unsaturated
    // (both sketches complete → estimates collapse to exact counts).
    // Computed as whole-partition window aggregates over the SAME pair
    // partitioning as the rank — one shuffle, no re-join of the ranked
    // table against a per-pair theta aggregate.
    val wAll = Window.partitionBy(col("key_a"), col("key_b"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ranked = merged.withColumn("rk", row_number().over(w))
      .withColumn("__thetaK",
        max(when(col("rk") === k, col("h"))).over(wAll))
      .withColumn("__nm", count(lit(1)).over(wAll))
      .withColumn("theta_saturated", col("__nm") >= k)
      .withColumn("__theta", coalesce(col("__thetaK"), lit(1L << 60)))
    ranked
      .filter(col("h") < col("__theta"))
      .groupBy(col("key_a"), col("key_b"), col("theta_saturated"),
        col("__theta"))
      .agg(
        sum(when(col("in_a") === 1 && col("in_b") === 1, 1L).otherwise(0L))
          .as("__rho_i"),
        count(lit(1)).as("__rho_u"))
      .select(col("key_a"), col("key_b"), col("theta_saturated"),
        round(col("__rho_i").cast("double") * lit(M) /
          col("__theta").cast("double"), 4).as("est_inter"),
        round(when(col("theta_saturated"),
            lit((k - 1).toDouble) * lit(M) / col("__theta").cast("double"))
          .otherwise(col("__rho_u").cast("double")), 4).as("est_union"))
  }
}
