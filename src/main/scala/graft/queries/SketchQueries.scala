package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Approximate/sketch operators with DETERMINISTIC oracles — the 100 TB
  * cardinality/quantile toolkit (HLL distinct counts, mergeable sketches,
  * rank-error quantiles), made gate-checkable via the bounded-error
  * pattern: the output carries the EXACT value (which DuckDB reproduces)
  * plus a boolean asserting the approximate answer landed inside its
  * published error bound (which DuckDB emits as a constant `true`). A
  * sketch drifting out of bound flips the boolean and fails the hash
  * compare — the approximation is genuinely under test, not just run.
  *
  * Why these matter at scale: exact `count(DISTINCT)` shuffles every
  * distinct value; an HLL sketch is a few KB per group, merges
  * associatively (partial aggregation works), and can be PRE-AGGREGATED —
  * per-partition/day sketches unioned later answer any rollup without
  * rescanning the facts (q_sketch_union demonstrates exactly that).
  * Exact percentiles need a full sort per group; approx_percentile's
  * KLL-style summary holds rank error at n/accuracy with O(accuracy)
  * memory regardless of n.
  */
object SketchQueries extends QueryGroup {

  val queries: Map[String, Q] = Map(
    // Per-group HLL distinct (rsd 0.01) vs exact, bounded at ±5%.
    "q_approx_distinct" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_exact"),
          approx_count_distinct(col("l_partkey"), rsd = 0.01).as("__approx"))
        .select(col("l_returnflag"), col("n_exact"),
          (abs(col("__approx") - col("n_exact")) <=
            greatest(lit(1.0), col("n_exact") * 0.05)).as("within_5pct"))
    }),

    // Mergeable-sketch rollup: one Datasketches HLL per l_linestatus,
    // unioned into a single global estimate — the pre-aggregate-then-merge
    // shape that answers rollups without rescanning facts.
    "q_sketch_union" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_linestatus"))
        .agg(hll_sketch_agg(col("l_partkey"), lit(14)).as("__sk"))
        .agg(hll_sketch_estimate(hll_union_agg(col("__sk"))).as("__merged"))
        .crossJoin(
          Tables.lineitem(s, dir).agg(countDistinct(col("l_partkey")).as("n_exact")))
        .select(col("n_exact"),
          (abs(col("__merged") - col("n_exact")) <=
            greatest(lit(1.0), col("n_exact") * 0.05)).as("within_5pct"))
    }),

    // Rank-error quantiles: approx_percentile(accuracy 10000) vs the exact
    // interpolated percentile; the integer-valued quantity domain makes
    // ±1.5 a conservative bound at n/10000 rank error.
    "q_approx_quantiles" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(
          percentile(col("l_quantity"), lit(0.5)).as("__p50"),
          percentile(col("l_quantity"), lit(0.9)).as("__p90"),
          percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("__a50"),
          percentile_approx(col("l_quantity"), lit(0.9), lit(10000)).as("__a90"))
        .select(col("l_returnflag"),
          round(col("__p50"), 4).as("p50"),
          round(col("__p90"), 4).as("p90"),
          (abs(col("__a50") - col("__p50")) <= 1.5 &&
            abs(col("__a90") - col("__p90")) <= 1.5).as("within_bound"))
    }))

  val oracles: Map[String, String] = Map(
    "q_approx_distinct" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_exact,
        |  true AS within_5pct
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_sketch_union" ->
      """SELECT count(DISTINCT l_partkey) AS n_exact, true AS within_5pct
        |FROM lineitem""".stripMargin,
    "q_approx_quantiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_quantity, 0.5), 4) AS p50,
        |  round(quantile_cont(l_quantity, 0.9), 4) AS p90,
        |  true AS within_bound
        |FROM lineitem GROUP BY l_returnflag""".stripMargin)
}
