package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift detection between a reference and a current slice
  * of the same feed — the monitoring gate a production pipeline runs
  * before trusting (or publishing) a new batch: training-data mixture
  * shift, upstream schema/unit changes, and seasonality bugs all show up
  * here first.
  *
  * Four statistics, two families: the binned pair (PSI over equal-width
  * bins, categorical PSI/χ²) emits PER-BUCKET rows — exact integer
  * counts plus one deterministically-derived rounded double per bucket,
  * no ordered global fold; Σ terms downstream gives the scalar (PSI >
  * 0.2 ≈ major shift by the usual credit-scoring rule of thumb). The
  * exact CDF pair ([[ksStatistic]], [[wasserstein1]]) emits a single
  * all-BIGINT row — sup and integral of the CDF gap in common-
  * denominator form, catching the whole-shape drift fixed bins can miss.
  *
  * Scale shape: each side reduces map-side FIRST (to ≤bins rows for the
  * binned pair, to one row per distinct value for the CDF pair, tiled on
  * deterministic quantile-literal boundaries); inputs are never joined
  * row-to-row.
  */
object Drift {

  /** Population Stability Index contributions over `nBins` equal-width
    * bins derived from the REFERENCE min/max (the convention: the
    * reference defines the binning; current values outside clamp to the
    * edge bins). Output per bin: (bin, ref_cnt, cur_cnt, psi_term) with
    * psi_term = (p̂−q̂)·ln(p̂/q̂) under add-one smoothing
    * (p̂=(ref_cnt+1)/(ref_n+nBins)), rounded to `roundTo`. Bins with no
    * mass on either side still appear (their smoothed term is 0).
    */
  def psiBins(ref: DataFrame, cur: DataFrame, valueCol: String,
      nBins: Int, roundTo: Int = 6): DataFrame = {
    require(nBins >= 2, s"need at least 2 bins, got $nBins")
    val spark = ref.sparkSession
    // One row; lazily checkpointed because both sides' binning broadcasts
    // it — without truncation the reference min/max scan runs twice.
    val bounds = ref.agg(
      min(col(valueCol).cast("double")).as("__lo"),
      max(col(valueCol).cast("double")).as("__hi"))
      .localCheckpoint(false)

    def binned(df: DataFrame, cntCol: String): DataFrame = {
      val x = col(valueCol).cast("double")
      val width = (col("__hi") - col("__lo")) / nBins
      val bin = least(greatest(
        floor((x - col("__lo")) / width), lit(0.0)), lit((nBins - 1).toDouble))
        .cast("int")
      df.crossJoin(broadcast(bounds))
        .filter(x.isNotNull)
        .select(when(col("__hi") === col("__lo"), lit(0)).otherwise(bin)
          .as("bin"))
        .groupBy("bin").agg(count(lit(1)).as(cntCol))
    }

    import spark.implicits._
    val spine = (0 until nBins).toDF("bin")
    val counts = spine
      .join(binned(ref, "ref_cnt"), Seq("bin"), "left_outer")
      .join(binned(cur, "cur_cnt"), Seq("bin"), "left_outer")
      .na.fill(0L, Seq("ref_cnt", "cur_cnt"))
      // Totals over the ≤nBins-row frame — broadcast-sized second pass.
      .localCheckpoint(false)
    val tot = counts.agg(sum("ref_cnt").as("__rn"), sum("cur_cnt").as("__cn"))
    counts.crossJoin(broadcast(tot))
      .select(col("bin"), col("ref_cnt"), col("cur_cnt"),
        (round(psiTerm(col("ref_cnt"), col("__rn"), col("cur_cnt"),
          col("__cn"), nBins), roundTo) + lit(0.0)).as("psi_term"))
  }

  private def psiTerm(rc: Column, rn: Column, cc: Column, cn: Column,
      k: Int): Column = {
    val p = (rc.cast("double") + 1.0) / (rn.cast("double") + k)
    val q = (cc.cast("double") + 1.0) / (cn.cast("double") + k)
    (p - q) * log(p / q)
  }

  /** Categorical drift: per-category (ref_cnt, cur_cnt, psi_term) over
    * the UNION of categories seen on either side, same smoothing and
    * rounding as [[psiBins]]. Bucket count = distinct categories — keep
    * the column low-cardinality (that is what categorical monitoring
    * means) or bucket upstream.
    */
  def categorical(ref: DataFrame, cur: DataFrame, catCol: String,
      roundTo: Int = 6): DataFrame = {
    def counts(df: DataFrame, cntCol: String): DataFrame =
      df.filter(col(catCol).isNotNull)
        .groupBy(col(catCol).as("category"))
        .agg(count(lit(1)).as(cntCol))
    val merged = counts(ref, "ref_cnt")
      .join(counts(cur, "cur_cnt"), Seq("category"), "full_outer")
      .na.fill(0L, Seq("ref_cnt", "cur_cnt"))
      .localCheckpoint(false)
    val k = merged.count().toInt.max(1)
    val tot = merged.agg(sum("ref_cnt").as("__rn"), sum("cur_cnt").as("__cn"))
    merged.crossJoin(broadcast(tot))
      .select(col("category"), col("ref_cnt"), col("cur_cnt"),
        (round(psiTerm(col("ref_cnt"), col("__rn"), col("cur_cnt"),
          col("__cn"), k), roundTo) + lit(0.0)).as("psi_term"))
  }

  /** Exact two-sample Kolmogorov-Smirnov statistic,
    * D = sup_v |F_a(v) - F_b(v)|, as pure BIGINTs: one row
    * (n_a, n_b, ks_num) with D = ks_num/(n_a*n_b) - the nonparametric
    * whole-shape drift test PSI's fixed bins can miss (a pure location
    * shift inside one wide bin is invisible to PSI, maximal to KS). No
    * float ever enters the statistic: |cumA*n_b - cumB*n_a| is the
    * common-denominator form of the CDF gap, so it hash-gates exactly.
    * If EITHER sample is empty the comparison is undefined and `ks_num`
    * is NULL — never a silent 0 that would read as "no drift" when a
    * monitored feed goes dark (the counts stay visible either way).
    *
    * Scale shape - the [[graft.ml.Eval.aucExact]] discipline on the
    * shared deterministic quantile tiles ([[graft.ml.Eval.tileOf]] +
    * cumLegs): both samples collapse to one (ca, cb) row per DISTINCT
    * value by a map-side-combined partial agg, the two cumulative legs
    * run tile-local + broadcast base offsets, and the sup is a plain max
    * aggregate. A continuous value column (|distinct| ~ n) never lands
    * in a single sorted partition.
    *
    * @param isA boolean column: true -> sample A, false -> sample B
    *            (NULL rows and NULL values are excluded)
    */
  def ksStatistic(df: DataFrame, value: Column, isA: Column): DataFrame =
    cdfGapFrame(df, value, isA)
      .agg(max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"),
        max(when(col("__na") > 0 && col("__nb") > 0, col("__gap")))
          .as("ks_num"))

  /** Exact 1-d Wasserstein-1 (earth-mover) distance between two samples
    * over an integer-grid value column: W1 = integral of |F_a - F_b| dv,
    * computed as sum_i gap_i*(v_{i+1} - v_i) with
    * gap_i = |cumA*n_b - cumB*n_a| - one row (n_a, n_b, w1_num) with
    * W1 = w1_num/(n_a*n_b) grid units. KS answers "how far apart at the
    * worst point"; W1 answers "how much mass moved how far" - the drift
    * pair. As in [[ksStatistic]], an empty side yields NULL `w1_num`,
    * never a silent 0.
    *
    * `valueGrid` must already be integral (e.g. cents via round(v*100)):
    * every term is then BIGINT-exact and the reduction order-free. Caller
    * contract: n_a*n_b*(max-min) must clear 2^63 - rescale the grid when
    * samples and ranges run hot.
    *
    * Same tiled shape as [[ksStatistic]], plus the cross-tile stitch the
    * integral needs: each tile's LAST row takes its delta-v from the NEXT
    * OCCUPIED tile's minimum value (quantile tiling can leave empty tile
    * ids, so tile+1 alone would silently drop a gap segment); the global
    * last row's gap is identically 0 (both CDFs are 1), so its missing
    * delta contributes nothing.
    */
  def wasserstein1(df: DataFrame, valueGrid: Column, isA: Column): DataFrame =
    cdfGapFrame(df, valueGrid.cast("long"), isA, withStitch = true)
      .select(col("__na"), col("__nb"),
        (col("__gap") *
          (coalesce(col("__nextv"), col("__stitchv"), col("__v")) - col("__v")))
          .as("__term"))
      .agg(max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"),
        sum(when(col("__na") > 0 && col("__nb") > 0, col("__term")))
          .as("w1_num"))

  /** Shared engine for the CDF statistics: per distinct value, the
    * common-denominator CDF gap plus totals (and, when `withStitch`, the
    * next distinct value across tile boundaries). Tiling and the
    * cumulative legs are the ONE shared implementation in
    * [[graft.ml.Eval.tileOf]]/cumLegs.
    */
  private def cdfGapFrame(df: DataFrame, value: Column, isA: Column,
      withStitch: Boolean = false): DataFrame = {
    val g = df
      .select(value.as("__v"), when(isA, 1L).otherwise(0L).as("__a"))
      .where(col("__v").isNotNull && isA.isNotNull)
      .groupBy(col("__v"))
      .agg(sum(col("__a")).as("__ca"),
        sum(lit(1L) - col("__a")).as("__cb"))
    val tiled = graft.ml.Eval.tileOf(g, col("__v"))
    val cum = graft.ml.Eval.cumLegs(tiled, col("__v"),
      Seq("__ca" -> "__cuma", "__cb" -> "__cumb"),
      descending = false, inclusive = true)
    val local =
      if (withStitch) {
        val W = org.apache.spark.sql.expressions.Window
        cum.withColumn("__nextv",
          lead(col("__v"), 1).over(W.partitionBy("__pid").orderBy(col("__v"))))
      } else cum
    val sizes = tiled.groupBy("__pid").agg(min(col("__v")).as("__minv"))
    val nextMin = sizes.alias("x")
      .join(sizes.alias("y"), col("y.__pid") > col("x.__pid"), "left")
      .groupBy(col("x.__pid").as("__pid"))
      .agg(min(struct(col("y.__pid").as("p"), col("y.__minv").as("m")))
        .getField("m").as("__stitchv"))
    val totals = tiled.agg(sum(col("__ca")).as("__na"),
      sum(col("__cb")).as("__nb"))
    val stitched =
      if (withStitch) local.join(broadcast(nextMin), Seq("__pid"), "left")
      else local
    stitched.crossJoin(broadcast(totals))
      .withColumn("__gap",
        abs(col("__cuma") * col("__nb") - col("__cumb") * col("__na")))
  }
}
