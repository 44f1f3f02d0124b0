package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog (Flajolet et al., AofA 2007), Spark-native: like
  * [[graft.text.CountMin]], the sketch is a BOUNDED AGGREGATE TABLE —
  * (reg, rho) with at most m = 256 rows — not opaque UDAF state. The
  * engine's own machinery then provides the sketch's classic properties:
  * map-side combine builds partial register tables per task, the shuffle
  * carries ≤ m rows per partition regardless of input size, and MERGE is
  * a per-register max (HLL union IS max), so per-source/day sketches can
  * be pre-aggregated and rolled up later without rescanning facts.
  *
  * Determinism: hashes are md5-derived (see [[Dedup.md5Hash60]]) and the
  * rank (leading-zero count) is computed from `bin()` string length —
  * both available verbatim in DuckDB — so any engine rebuilds the
  * register table bit-for-bit. The estimator keeps the register power
  * sum Σ 2^(-rho) EXACT by scaling to integers (Σ 2^(53-rho) ≤ 2^61
  * fits a BIGINT) and performs the single float division last, so the
  * estimate is engine-exact too (`q_hll_distinct` gates it against a
  * full SQL rebuild).
  *
  * Geometry: the 60-bit hash donates B = 8 index bits (m = 256 registers,
  * rsd 1.04/√256 ≈ 6.5%) and a 52-bit tail; rho = leading zeros of the
  * tail + 1 ∈ [1, 53], with the all-zero tail pinned to 53.
  */
object Hll {

  val B = 8
  val M: Int = 1 << B   // 256 registers
  val R = 53            // max rank: 52 tail bits all zero → rho = 53

  private def rank(w: Column): Column =
    when(w === 0L, lit(R)).otherwise(lit(R) - length(bin(w)))

  /** Register table (groupCols..., reg, rho): ≤ m rows per group. */
  def registers(items: DataFrame, itemCol: String,
      groupCols: Seq[String] = Nil): DataFrame = {
    val h = Dedup.md5Hash60(col(itemCol))
    val projected = items.select(groupCols.map(col) ++ Seq(
      pmod(h, lit(M.toLong)).as("reg"),
      rank(shiftright(h, B)).as("rho")): _*)
    projected.groupBy(groupCols.map(col) :+ col("reg"): _*)
      .agg(max(col("rho")).as("rho"))
  }

  /** HLL union is a per-register max — merging N pre-aggregated sketches
    * is bit-identical to one sketch over the concatenated inputs.
    */
  def merge(regs: DataFrame): DataFrame =
    regs.groupBy(col("reg")).agg(max(col("rho")).as("rho"))

  /** Single-row distinct-count estimate from a (reg, rho) table. Absent
    * registers are rho = 0; the small-range (linear counting) branch uses
    * the count of untouched registers. Output column `hll_est` (double,
    * un-rounded — callers round for display).
    */
  def estimate(regs: DataFrame): DataFrame = estimateBy(regs, Nil)

  /** Per-group estimate from a (groupCols..., reg, rho) table — one
    * `hll_est` row per group (global with no groups). Same arithmetic as
    * the single-sketch estimator, written with the SAME literal
    * association as the DuckDB oracle so the folded constant is
    * identical.
    */
  def estimateBy(regs: DataFrame, groupCols: Seq[String]): DataFrame = {
    val agg = regs.groupBy(groupCols.map(col): _*).agg(
      count(lit(1)).as("__present"),
      sum(expr(s"shiftleft(CAST(1 AS BIGINT), $R - rho)")).as("__sp"))
    val sD = (coalesce(col("__sp"), lit(0L)) +
      (lit(M.toLong) - col("__present")) * lit(1L << R)).cast("double")
    val v = (lit(M.toLong) - col("__present")).cast("double")
    val raw = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) *
      lit(65536.0) * lit(9007199254740992.0) / sD
    agg.select(groupCols.map(col) :+
      when(raw <= lit(2.5 * M) && v > lit(0.0),
        lit(M.toDouble) * log(lit(M.toDouble) / v))
        .otherwise(raw).as("hll_est"): _*)
  }
}
