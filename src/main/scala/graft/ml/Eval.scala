package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier/ranker evaluation statistics, kept integer-exact so the
  * numbers gate cross-engine (the quality-classifier twin of the dedup
  * family's confusion-matrix eval).
  */
object Eval {

  /** Exact AUC sufficient statistics for a score against a binary label:
    * one row (p, n, auc_num_x2) with AUC = auc_num_x2 / (2·p·n) — the
    * Mann–Whitney form Σ_pos (2·N_below + N_ties), all BIGINT, tie-aware.
    *
    * Scale shape, two layers:
    *   1. the corpus reduces FIRST by a score-keyed partial agg to one
    *      row per DISTINCT score (cp, cn) — map-side combine, so the
    *      shuffle carries score cardinality, not row count;
    *   2. the cumulative-negatives-below rank statistic over that frame
    *      is a RANGE-TILED prefix sum (the [[graft.ops.SeqPack]] shape):
    *      range-partition on score, a per-tile local window, tile totals
    *      folded into broadcast base offsets. No single-partition sort
    *      anywhere — a CONTINUOUS score column (|distinct| ≈ n) costs
    *      the same two narrow passes as an integer one.
    */
  def aucExact(df: DataFrame, score: Column, label: Column): DataFrame =
    aucExactWithTies(df, score, label)
      .select(col("p"), col("n"), col("auc_num_x2"))

  /** Deterministic quantile tiling for the rank statistics: `__pid` is a
    * PURE FUNCTION of the key — boundaries are computed once on the
    * driver (approxQuantile over the already-reduced distinct-key frame,
    * a bounded parts-sized result) and baked into the plan as literals.
    * Load-bearing choice: `spark_partition_id()` over
    * `repartitionByRange` is not guaranteed stable across the multiple
    * instantiations a self-joining plan makes of the tiled subtree (each
    * instantiation may re-sample its range boundaries), which would
    * mis-key the base-offset join; literal boundaries cannot disagree
    * with themselves. The double cast is monotone, and any monotone
    * consistent bucketing keeps the prefix-sum algebra exact — a
    * collision above 2^53 merely coarsens a tile.
    */
  private[graft] def tileOf(g: DataFrame, key: Column): DataFrame = {
    val parts = g.sparkSession.sessionState.conf.numShufflePartitions
    val probes = (1 until parts).map(_.toDouble / parts).toArray
    val bounds =
      if (probes.isEmpty) Array.empty[Double]
      else g.select(key.cast("double").as("__kd"))
        .stat.approxQuantile("__kd", probes, 0.001).distinct.sorted
    g.withColumn("__pid",
      size(filter(typedLit(bounds), b => b <= key.cast("double"))))
  }

  /** [[aucExact]] plus `tie_sum` = Σ(t³−t) over tie groups — folded into
    * the SAME final aggregate over the distinct-score frame, so callers
    * needing the rank-sum variance correction
    * ([[graft.ops.Experiment.rankSum]]) pay zero extra passes.
    */
  private[graft] def aucExactWithTies(df: DataFrame, score: Column,
      label: Column): DataFrame = {
    // Rows with a null score are dropped up front: Spark windows default to
    // NULLS FIRST while the DuckDB oracle pattern is NULLS LAST, so a null
    // score would make the cumulative-negative counts engine-dependent.
    val g = df
      .select(score.as("__s"), when(label, 1L).otherwise(0L).as("__y"))
      .where(col("__s").isNotNull)
      .groupBy(col("__s"))
      .agg(sum(col("__y")).as("__cp"),
        sum(lit(1L) - col("__y")).as("__cn"))
    // Tile the distinct-score frame on DETERMINISTIC quantile boundaries
    // (driver-computed literals — see tileOf): tile-local exclusive
    // cumsum of negatives, then per-tile totals → exclusive base offsets
    // (the triangle join is #tiles², broadcast-sized by construction).
    // Tile ids are monotone in score, so tile order IS score order.
    val local0 = tileOf(g, col("__s"))
    val wLocal = Window.partitionBy("__pid").orderBy("__s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = local0
      .withColumn("__lnb", coalesce(sum(col("__cn")).over(wLocal), lit(0L)))
    val sizes = local0.groupBy("__pid").agg(sum(col("__cn")).as("__cnt"))
    val offsets = sizes.alias("a")
      .join(sizes.alias("b"), col("b.__pid") < col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(coalesce(sum(col("b.__cnt")), lit(0L)).as("__base"))
    local.join(broadcast(offsets), "__pid")
      .select(col("__cp"), col("__cn"),
        (col("__base") + col("__lnb")).as("__nb"))
      .agg(sum(col("__cp")).as("p"), sum(col("__cn")).as("n"),
        sum(col("__cp") * (lit(2L) * col("__nb") + col("__cn")))
          .as("auc_num_x2"),
        coalesce(sum((col("__cp") + col("__cn")) * (col("__cp") + col("__cn"))
          * (col("__cp") + col("__cn")) - (col("__cp") + col("__cn"))),
          lit(0L)).as("tie_sum"))
  }

  /** The full confusion matrix at EVERY distinct-score threshold: one row
    * per distinct score `thr` with (tp, fp, fn, tn) for the classifier
    * "predict positive iff score ≥ thr" — the exact ROC/PR curve points,
    * all BIGINT. This is the artifact a threshold sweep, an ROC plot, or
    * an operating-point picker reads; `aucExact` is its integral.
    *
    * Same two-layer scale shape as [[aucExact]]: the corpus collapses to
    * one (cp, cn) row per DISTINCT score by a map-side-combined partial
    * agg first, then tp/fp — inclusive descending cumulative sums of
    * cp/cn — run as a range-tiled prefix sum (tile-local window +
    * broadcast base offsets). A continuous score (|distinct| ≈ n) never
    * lands in a single sorted partition.
    */
  def rocPoints(df: DataFrame, score: Column, label: Column): DataFrame =
    rocPointsWithCp(df, score, label)
      .select(col("thr"), col("tp"), col("fp"), col("fn"), col("tn"))

  /** [[rocPoints]] plus the per-threshold positive count `__cp` (= ΔTP),
    * which [[averagePrecision]] consumes — kept internal so the public
    * curve schema stays minimal while AP needs no second corpus scan.
    */
  private def rocPointsWithCp(df: DataFrame, score: Column,
      label: Column): DataFrame = {
    val g = df
      .select(score.as("thr"), when(label, 1L).otherwise(0L).as("__y"))
      .where(col("thr").isNotNull)
      .groupBy(col("thr"))
      .agg(sum(col("__y")).as("__cp"),
        sum(lit(1L) - col("__y")).as("__cn"))
    // Deterministic quantile tiles (ascending in score); the descending
    // cumulative's base offset is the (cp, cn) mass of all STRICTLY
    // HIGHER scores — exactly the tiles with a LARGER tile id.
    val local0 = tileOf(g, col("thr"))
    val wLocal = Window.partitionBy("__pid").orderBy(col("thr").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val local = local0
      .withColumn("__ltp", sum(col("__cp")).over(wLocal))
      .withColumn("__lfp", sum(col("__cn")).over(wLocal))
    val sizes = local0.groupBy("__pid")
      .agg(sum(col("__cp")).as("__tcp"), sum(col("__cn")).as("__tcn"))
    val offsets = sizes.alias("a")
      .join(sizes.alias("b"), col("b.__pid") > col("a.__pid"), "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(coalesce(sum(col("b.__tcp")), lit(0L)).as("__btp"),
        coalesce(sum(col("b.__tcn")), lit(0L)).as("__bfp"))
    val totals = g.agg(sum(col("__cp")).as("__p"), sum(col("__cn")).as("__n"))
    local.join(broadcast(offsets), "__pid")
      .crossJoin(broadcast(totals))
      .select(col("thr"),
        (col("__btp") + col("__ltp")).as("tp"),
        (col("__bfp") + col("__lfp")).as("fp"),
        (col("__p") - col("__btp") - col("__ltp")).as("fn"),
        (col("__n") - col("__bfp") - col("__lfp")).as("tn"),
        col("__cp"))
  }

  /** Exact average precision (PR-AUC in its standard step-function form):
    * AP = Σ_thr ΔTP(thr) · precision(thr) / P, summed over distinct
    * scores descending. Because tp is the inclusive descending cumsum of
    * cp, ΔTP at a threshold is simply cp at that threshold — no lag
    * window is needed on top of [[rocPoints]].
    *
    * Engine-portable exactness: each per-threshold term
    * cp · tp/(tp+fp) is ONE IEEE division and multiply (bit-identical
    * across engines for identical inputs), quantized to an integer
    * micro-nano grid BEFORE the global sum — so the reduction is a
    * BIGINT sum, order-independent and hash-stable. Output is one row
    * (p, n, ap_num_q) with AP = ap_num_q / (1e9 · p).
    */
  def averagePrecision(df: DataFrame, score: Column, label: Column): DataFrame = {
    // ΔTP at a threshold is cp — the positive count AT that exact score —
    // because tp is the inclusive descending cumsum of cp, and the
    // internal curve variant carries cp through, so AP is one projection
    // and one scalar agg on top of the curve: no second corpus scan, no
    // threshold-keyed join.
    rocPointsWithCp(df, score, label)
      .select(col("tp"), col("fn"),
        floor(col("__cp").cast("double") *
          (col("tp").cast("double") /
            (col("tp") + col("fp")).cast("double")) * lit(1e9))
          .cast("long").as("__term"))
      .agg(max(col("tp") + col("fn")).as("p"),
        sum(col("__term")).as("ap_num_q"))
  }

  /** Reliability table for a probability-like score in [0, 1): `bins`
    * equal-width bins over the score, one row per OCCUPIED bin with
    * (bin, n, pos, prob_sum_q) — counts BIGINT, the score mass quantized
    * to a 1e-9 grid per row BEFORE summing so the per-bin total is an
    * order-independent BIGINT. ECE and any reliability plot derive from
    * this table; the corpus is touched once, map-side combined.
    */
  def calibrationBins(df: DataFrame, prob: Column, label: Column,
      bins: Int): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    df.select(prob.cast("double").as("__pr"),
        when(label, 1L).otherwise(0L).as("__y"))
      .where(col("__pr").isNotNull)
      .groupBy(least(floor(col("__pr") * lit(bins)), lit(bins - 1L))
        .cast("long").as("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("pos"),
        sum(floor(col("__pr") * lit(1e9)).cast("long")).as("prob_sum_q"))
  }
}
