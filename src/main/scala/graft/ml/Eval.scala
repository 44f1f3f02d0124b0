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
    *
    * NaN contract: a NaN key routes to the HIGHEST tile id. Both Spark
    * and DuckDB total-order NaN above every double (ascending windows
    * put NaN last), so the within-tile window ordering and the tile
    * assignment agree; the naive `b <= NaN` filter is false for every
    * boundary and would drop NaN into tile 0 — ranked lowest by tile
    * but highest by the window, silently losing all higher-tile mass
    * from its cumulative legs. NaN boundaries from the probe (possible
    * when NaN keys dominate a quantile) are discarded — losing a
    * boundary only coarsens a tile, never mis-orders one.
    */
  private[graft] def tileOf(g0: DataFrame, key: Column): DataFrame = {
    // Lazily checkpoint the reduced frame: the boundary probe below is an
    // eager action, and every consumer branch (windows, sizes, offsets)
    // re-reads the same frame — without truncation each branch would
    // re-run the corpus groupBy (the Drift.psiBins convention).
    val g = g0.localCheckpoint(false)
    val parts = g.sparkSession.sessionState.conf.numShufflePartitions
    g.withColumn("__pid",
      tilePid(key, tileBoundaries(g, key, parts)))
  }

  /** Driver-side literal tile boundaries for [[tilePid]]: ≤ parts−1
    * distinct non-NaN doubles from one approxQuantile probe over `key`.
    */
  private[graft] def tileBoundaries(df: DataFrame, key: Column,
      parts: Int): Array[Double] = {
    val probes = (1 until parts).map(_.toDouble / parts).toArray
    if (probes.isEmpty) Array.empty[Double]
    else df.select(key.cast("double").as("__kd"))
      .stat.approxQuantile("__kd", probes, 0.001)
      .filterNot(_.isNaN).distinct.sorted
  }

  /** Pure-function tile id of `key` against literal `bounds`: the count
    * of boundaries ≤ the key, with NaN routed to the top tile (see the
    * [[tileOf]] NaN contract). Deterministic across any number of plan
    * instantiations — the property `spark_partition_id()` over
    * `repartitionByRange` cannot give.
    */
  private[graft] def tilePid(key: Column, bounds: Array[Double]): Column =
    when(isnan(key.cast("double")), lit(bounds.length))
      .otherwise(size(filter(typedLit(bounds), b => b <= key.cast("double"))))

  /** The shared tiled-prefix-sum machinery over a frame ALREADY tiled by
    * [[tileOf]] (pass that one frame — re-tiling would re-probe
    * boundaries): for each `(src, dst)` leg, adds `dst` = the cumulative
    * sum of `src` in `key` order across the WHOLE frame, computed as a
    * tile-local window plus broadcast base offsets from the
    * direction-appropriate triangle join (descending order ⇒ base mass
    * comes from LARGER tile ids). `inclusive = false` gives the
    * exclusive (strictly-prior) cumulative. One definition of the
    * direction-sensitive offset join for every rank statistic.
    */
  private[graft] def cumLegs(tiled: DataFrame, key: Column,
      legs: Seq[(String, String)], descending: Boolean,
      inclusive: Boolean): DataFrame = {
    val ord = if (descending) key.desc else key.asc
    val upper = if (inclusive) 0L else -1L
    val w = Window.partitionBy("__pid").orderBy(ord)
      .rowsBetween(Window.unboundedPreceding, upper)
    val local = legs.foldLeft(tiled) { case (f, (src, dst)) =>
      f.withColumn(s"__l_$dst",
        coalesce(sum(col(src)).over(w), lit(0L)))
    }
    val sizes = tiled.groupBy("__pid")
      .agg(legs.map { case (src, dst) => sum(col(src)).as(s"__t_$dst") }.head,
        legs.tail.map { case (src, dst) => sum(col(src)).as(s"__t_$dst") }: _*)
    val cmp =
      if (descending) col("b.__pid") > col("a.__pid")
      else col("b.__pid") < col("a.__pid")
    val offsets = sizes.alias("a")
      .join(sizes.alias("b"), cmp, "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(legs.map { case (_, dst) =>
          coalesce(sum(col(s"b.__t_$dst")), lit(0L)).as(s"__b_$dst") }.head,
        legs.tail.map { case (_, dst) =>
          coalesce(sum(col(s"b.__t_$dst")), lit(0L)).as(s"__b_$dst") }: _*)
    legs.foldLeft(local.join(broadcast(offsets), "__pid")) {
      case (f, (_, dst)) =>
        f.withColumn(dst, col(s"__b_$dst") + col(s"__l_$dst"))
          .drop(s"__b_$dst", s"__l_$dst", s"__t_$dst")
    }
  }

  /** Max-monoid sibling of [[cumLegs]] for the dominance sweeps
    * ([[graft.ops.Skyline.front2d]]): `dst` = running MAX of `src` in
    * `key` order across the whole tiled frame, EXCLUSIVE — strictly-prior
    * rows only, because a dominance candidate never competes with itself.
    * Same two narrow passes as the sum legs: a tile-local exclusive
    * window plus broadcast per-tile maxima folded through the
    * direction-appropriate triangle join (descending order ⇒ prior mass
    * comes from LARGER tile ids, whose keys are STRICTLY greater — a
    * boundary b with key_a < b ≤ key_b separates any two tiles). `dst`
    * is NULL when no strictly-prior row exists anywhere; the merge is
    * `greatest`, which skips NULL sides, so no sentinel value can ever
    * collide with real data.
    */
  private[graft] def cumMaxLeg(tiled: DataFrame, key: Column,
      src: String, dst: String, descending: Boolean): DataFrame = {
    val ord = if (descending) key.desc else key.asc
    val w = Window.partitionBy("__pid").orderBy(ord)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = tiled.withColumn("__lm", max(col(src)).over(w))
    val tileMax = tiled.groupBy("__pid").agg(max(col(src)).as("__tm"))
    val cmp =
      if (descending) col("b.__pid") > col("a.__pid")
      else col("b.__pid") < col("a.__pid")
    val offsets = tileMax.alias("a")
      .join(tileMax.alias("b"), cmp, "left")
      .groupBy(col("a.__pid").as("__pid"))
      .agg(max(col("b.__tm")).as("__bm"))
    local.join(broadcast(offsets), "__pid")
      .withColumn(dst, greatest(col("__lm"), col("__bm")))
      .drop("__lm", "__bm")
  }

  /** [[aucExact]] plus `tie_sum` = Σ(t³−t) over tie groups — folded into
    * the SAME final aggregate over the distinct-score frame, so callers
    * needing the rank-sum variance correction
    * ([[graft.ops.Experiment.rankSum]]) pay zero extra passes.
    *
    * Magnitude contract: each t³ term is computed in DECIMAL(38,0), not
    * BIGINT — a single tie group of ~2.1M rows (a coarse or constant
    * metric at corpus scale) already overflows t³ < 2^63, which would
    * silently corrupt the variance (or throw under ANSI). Decimal keeps
    * the per-term bound at t < ~4.6e12 rows and the exact integer sum at
    * Σ < 10^38; the surfaced `tie_sum` is that exact integer cast ONCE
    * to double (both engines round the same integer to the same double,
    * and the downstream σ² consumes it as a double anyway).
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
    // (driver-computed literals — see tileOf), then the exclusive
    // cumulative of negatives-below via the shared cumLegs machinery.
    val cum = cumLegs(tileOf(g, col("__s")), col("__s"),
      Seq("__cn" -> "__nb"), descending = false, inclusive = false)
    cum.select(col("__cp"), col("__cn"), col("__nb"))
      .agg(sum(col("__cp")).as("p"), sum(col("__cn")).as("n"),
        sum(col("__cp") * (lit(2L) * col("__nb") + col("__cn")))
          .as("auc_num_x2"),
        coalesce(sum({
          val t = (col("__cp") + col("__cn")).cast("decimal(38,0)")
          t * t * t - t
        }), lit(0)).cast("double").as("tie_sum"))
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
    // Descending inclusive cumulatives via the shared tiled machinery;
    // fn/tn fall out of the totals.
    val tiled = tileOf(g, col("thr"))
    val cum = cumLegs(tiled, col("thr"),
      Seq("__cp" -> "tp", "__cn" -> "fp"),
      descending = true, inclusive = true)
    val totals = tiled.agg(sum(col("__cp")).as("__p"),
      sum(col("__cn")).as("__n"))
    cum.crossJoin(broadcast(totals))
      .select(col("thr"), col("tp"), col("fp"),
        (col("__p") - col("tp")).as("fn"),
        (col("__n") - col("fp")).as("tn"),
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
